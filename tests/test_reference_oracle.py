"""Cross-validation against the reference's own captured test data.

Two oracles (VERDICT round-1, item 6):

1. **Golden hit lists** — the reference pins its trickiest device logic
   (hit dedupe + interval pairing, ``optix_trace_rays.cu:110-266``) to five
   captured per-ray OptiX hit lists replayed in pure Python
   (``/root/reference/tests/test_sort.py:3-690``). We load those lists
   straight from the reference tree (no copy) and run an independent
   interval-pairing implementation over them, asserting the same
   invariants the paired output must satisfy: every tetrahedron yields
   exactly one [entry, exit] interval (after zero-size dedupe), intervals
   are sorted, non-overlapping, and contiguous.

2. **bottle.ply end-to-end** — the reference's integration test traces a
   pinhole camera against the Delaunay triangulation of
   ``tests/assets/bottle.ply`` and asserts that points reconstructed from
   the emitted barycentric coordinates project back onto their rays within
   |dot - 1| <= 0.05, and that inter-interval gaps are a negligible
   fraction of the traversed span (``test_tetrahedra_tracer.py:62-218``).
   We run our full pipeline (PLY read -> Qhull Delaunay -> mesh build ->
   march) on the same asset and assert the same invariants.

Both tests skip cleanly when the reference tree is not present.
"""

from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference tree not available"
)


# --------------------------------------------------------------------------
# 1. Interval pairing oracle over the reference's captured hit lists
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def golden_hit_lists():
    """Load t0..t4 from the reference's test_sort.py without copying it."""
    import importlib.util

    path = REF / "tests" / "test_sort.py"
    if not path.exists():
        pytest.skip("reference test_sort.py not found")
    spec = importlib.util.spec_from_file_location("_ref_test_sort", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return [getattr(mod, f"t{i}") for i in range(5)]


def pair_hit_list(hits, eps=1e-6):
    """Pair raw (distance, tet, face) triangle hits into sorted intervals.

    Independent formulation of the reference's dedupe+pairing semantics:
    per tetrahedron, cluster hit distances within ``eps`` (OptiX double-
    registers shared faces and edge grazes land several faces at one
    distance). A tetrahedron with two distance clusters was genuinely
    traversed -> interval [min, max]; a single cluster is a zero-length
    graze and is dropped (the reference drops these too,
    ``optix_trace_rays.cu:208``); more than two clusters is impossible for
    a convex cell and is an error.

    Returns ``(intervals, n_dropped)`` with intervals sorted by entry as a
    list of ``(t_in, t_out, tet)``.
    """
    by_tet = {}
    for d, tet, _face in hits:
        by_tet.setdefault(tet, []).append(d)
    intervals = []
    dropped = 0
    for tet, ds in by_tet.items():
        ds = sorted(ds)
        clusters = [ds[0]]
        for d in ds[1:]:
            if d - clusters[-1] > eps:
                clusters.append(d)
        if len(clusters) == 1:
            dropped += 1
        elif len(clusters) == 2:
            intervals.append((clusters[0], clusters[1], tet))
        else:
            raise AssertionError(
                f"tet {tet} has {len(clusters)} crossing distances; a "
                f"convex cell admits at most two: {clusters}"
            )
    intervals.sort()
    return intervals, dropped


@pytest.mark.parametrize("ray", range(5))
def test_pairing_oracle_on_reference_hits(golden_hit_lists, ray):
    hits = golden_hit_lists[ray]
    intervals, dropped = pair_hit_list(hits)

    # The reference's assertion: the pairing completes with (nearly) every
    # face matched. Dropped = zero-size grazes, a small minority.
    assert len(intervals) >= 5, f"ray {ray}: only {len(intervals)} intervals"
    assert dropped <= max(3, 0.1 * len(intervals)), (
        f"ray {ray}: {dropped} unmatched/zero-size tets vs "
        f"{len(intervals)} intervals"
    )

    t_in = np.array([iv[0] for iv in intervals])
    t_out = np.array([iv[1] for iv in intervals])
    # Sorted, positive-length, non-overlapping.
    assert np.all(t_out > t_in)
    assert np.all(t_in[1:] >= t_in[:-1])
    overlap = np.maximum(t_out[:-1] - t_in[1:], 0.0)
    assert np.all(overlap <= 1e-6), overlap.max()
    # Contiguity: consecutive intervals share endpoints (the marcher's
    # output guarantees this by construction; the paired OptiX output must
    # agree up to the dedupe epsilon).
    gaps = t_in[1:] - t_out[:-1]
    span = t_out[-1] - t_in[0]
    assert gaps.sum() <= 0.02 * span, (
        f"ray {ray}: gap fraction {gaps.sum() / span:.4f}"
    )


# --------------------------------------------------------------------------
# 2. Full pipeline on the reference's bottle.ply asset
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def bottle_mesh():
    from tetranerf_tpu.geometry import build_mesh
    from tetranerf_tpu.geometry.ply import read_ply

    asset = REF / "tests" / "assets" / "bottle.ply"
    if not asset.exists():
        pytest.skip("bottle.ply not found")
    points, _ = read_ply(asset)
    assert len(points) == 2549  # the reference's triangulation test checks
    return build_mesh(points, two_hop_table=False)


def _pinhole_rays(width, height, eye, lookat, up, fov_y_deg):
    """Simple pinhole ray grid (the reference test uses the same camera:
    eye (0,1,0), lookat origin, up +z, fovY 45,
    ``test_tetrahedra_tracer.py:23-59``)."""
    eye = np.asarray(eye, np.float64)
    w = np.asarray(lookat, np.float64) - eye
    wlen = np.linalg.norm(w)
    u = np.cross(w, np.asarray(up, np.float64))
    u /= np.linalg.norm(u)
    v = np.cross(u, w)
    v /= np.linalg.norm(v)
    vlen = wlen * np.tan(np.radians(fov_y_deg) / 2)
    ulen = vlen * width / height
    sx = np.linspace(-1, 1, width)
    sy = np.linspace(-1, 1, height)
    gx, gy = np.meshgrid(sx, sy, indexing="xy")
    dirs = (
        gx.reshape(-1, 1) * (u * ulen)
        + gy.reshape(-1, 1) * (v * vlen)
        + w[None, :]
    )
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = np.broadcast_to(eye, dirs.shape).copy()
    return origins.astype(np.float32), dirs.astype(np.float32)


def test_bottle_march_invariants(bottle_mesh):
    from tetranerf_tpu.ops import trace_rays

    origins, dirs = _pinhole_rays(
        32, 32, eye=(0.0, 1.0, 0.0), lookat=(0, 0, 0), up=(0, 0, 1),
        fov_y_deg=45.0,
    )
    out = trace_rays(bottle_mesh, origins, dirs, max_visited_cells=256)
    num = np.asarray(out["num_visited_cells"])
    assert num.max() > 10, "no ray traversed the bottle"

    t0 = np.asarray(out["hit_distances"][..., 0])
    t1 = np.asarray(out["hit_distances"][..., 1])
    valid = np.arange(t0.shape[1])[None, :] < num[:, None]

    # Gap statistic: the reference prints sum(|t0[k+1]-t1[k]|)/ray_len and
    # expects it tiny; the marcher emits contiguous intervals exactly.
    both = valid[:, 1:] & valid[:, :-1]
    gaps = np.abs(t0[:, 1:] - t1[:, :-1]) * both
    ray_len = np.where(num > 0, t1.max(axis=1, initial=0.0), 0.0) - np.where(
        num > 0, np.where(valid, t0, np.inf).min(axis=1, initial=np.inf), 0.0
    )
    nz = num > 1
    frac = gaps.sum(axis=1)[nz] / np.maximum(ray_len[nz], 1e-6)
    assert frac.mean() < 1e-3, frac.mean()

    # Reprojection (the reference's hard assertion,
    # test_tetrahedra_tracer.py:204-207): entry/exit points reconstructed
    # from barycentric coordinates + vertex indices lie on their ray.
    verts = np.asarray(bottle_mesh.vertices)
    vids = np.asarray(out["vertex_indices"]).astype(np.int64)  # [R,T,4]
    bary123 = np.asarray(out["barycentric_coordinates"])  # [R,T,2,3]
    bary = np.concatenate(
        [1.0 - bary123.sum(-1, keepdims=True), bary123], axis=-1
    )  # [R,T,2,4]
    rng = np.random.default_rng(42)
    rays = rng.choice(np.where(num > 0)[0], size=64, replace=True)
    for r in rays:
        n = num[r]
        pts = np.einsum(
            "tkv,tvx->tkx", bary[r, :n], verts[vids[r, :n] % len(verts)]
        ).reshape(-1, 3)
        rel = pts - origins[r]
        rel /= np.linalg.norm(rel, axis=1, keepdims=True)
        dots = rel @ dirs[r]
        assert np.all(np.abs(dots - 1.0) <= 0.05), (
            r,
            np.abs(dots - 1.0).max(),
        )


def test_bottle_triangulation_invariants():
    """The reference's CPU triangulation test on the same asset
    (``tests/test_triangulation.py:9-28``): shape, index bounds, count."""
    from tetranerf_tpu.geometry.delaunay import triangulate
    from tetranerf_tpu.geometry.ply import read_ply

    asset = REF / "tests" / "assets" / "bottle.ply"
    if not asset.exists():
        pytest.skip("bottle.ply not found")
    points, _ = read_ply(asset)
    cells = triangulate(points)
    assert cells.ndim == 2 and cells.shape[1] == 4
    assert cells.max() == len(points) - 1
    assert cells.min() >= 0
    assert len(cells) > 2500
