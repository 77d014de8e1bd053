"""Traversal tests: hull slab, marching, point location, sample matching.

Mirrors the invariant structure of the reference's
``tests/test_tetrahedra_tracer.py``: interval-gap statistics, the
hand-built cube fixture, exact barycentric recovery for hand-mixed points,
and the ray-reprojection check (interpolating vertex positions with the
returned barycentrics must land on the ray).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tetranerf_tpu.geometry import build_mesh
from tetranerf_tpu.ops import (
    hull_intersect,
    locate_points,
    march,
    match_samples,
    trace_rays,
)
from tetranerf_tpu.ops.matching import find_visited_cells


@pytest.fixture(scope="module")
def ball_mesh(ball_points):
    return build_mesh(ball_points)


def _random_outside_rays(rng, n, radius=3.0, target_scale=0.3):
    origins = rng.normal(size=(n, 3))
    origins *= radius / np.linalg.norm(origins, axis=1, keepdims=True)
    targets = rng.uniform(-target_scale, target_scale, size=(n, 3))
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return origins.astype(np.float32), dirs.astype(np.float32)


def test_cube_single_ray(cube_mesh):
    vertices, cells = cube_mesh
    mesh = build_mesh(vertices, cells)
    o = np.array([[-1.0, 0.5, 0.5]], np.float32)
    d = np.array([[1.0, 0.0, 0.0]], np.float32)
    res = march(mesh, o, d, max_steps=32)
    n = int(res.num_cells[0])
    assert n >= 2
    t0 = np.asarray(res.t0[0, :n])
    t1 = np.asarray(res.t1[0, :n])
    # Enters at x=0 (t=1), exits at x=1 (t=2).
    assert t0[0] == pytest.approx(1.0, abs=1e-4)
    assert t1[-1] == pytest.approx(2.0, abs=1e-4)
    # Contiguous, sorted intervals covering the chord.
    np.testing.assert_allclose(t0[1:], t1[:-1], atol=1e-5)
    assert (t1 - t0 >= -1e-6).all()
    assert np.sum(t1 - t0) == pytest.approx(1.0, abs=1e-4)


def test_cube_miss(cube_mesh):
    vertices, cells = cube_mesh
    mesh = build_mesh(vertices, cells)
    o = np.array([[-1.0, 0.5, 0.5], [0.5, 0.5, 3.0]], np.float32)
    d = np.array([[-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], np.float32)
    res = march(mesh, o, d, max_steps=16)
    np.testing.assert_array_equal(np.asarray(res.num_cells), [0, 0])


def test_hull_intersect(ball_mesh, rng):
    o, d = _random_outside_rays(rng, 64)
    t_in, t_out, _, hit = (np.asarray(x) for x in hull_intersect(ball_mesh, o, d))
    assert hit.all()  # rays aim at the interior
    assert (t_in > 0).all() and (t_out > t_in).all()
    # Entry/exit points lie near the hull boundary. Tolerance is loose:
    # the f32 slab amplifies roundoff on near-tangent facets (the marcher
    # recovers the exact entry locally from the entry cell's planes).
    eqs = np.asarray(ball_mesh.hull_eqs, np.float64)
    for t in (t_in, t_out):
        p = o + t[:, None] * d
        ev = p @ eqs[:, :3].T + eqs[:, 3]
        np.testing.assert_allclose(ev.max(axis=1), 0.0, atol=2e-2)


def test_march_covers_chord(ball_mesh, rng):
    o, d = _random_outside_rays(rng, 64)
    t_in, t_out, _, _ = hull_intersect(ball_mesh, o, d)
    res = march(ball_mesh, o, d, max_steps=128)
    num = np.asarray(res.num_cells)
    assert (num > 0).all()
    t0 = np.asarray(res.t0)
    t1 = np.asarray(res.t1)
    for r in range(len(o)):
        n = num[r]
        # Sorted and contiguous (Delaunay fills the hull: no gaps).
        np.testing.assert_allclose(t0[r, 1:n], t1[r, : n - 1], atol=1e-4)
        # Chord endpoints match the slab up to its f32 tangent-facet error.
        assert t0[r, 0] == pytest.approx(float(t_in[r]), abs=3e-2)
        assert t1[r, n - 1] == pytest.approx(float(t_out[r]), abs=3e-2)


def test_march_from_inside(ball_mesh, rng):
    # Origin at the center of the cloud: the behind-origin part of the
    # chord must be clipped, first interval entry >= 0.
    origins = np.zeros((32, 3), np.float32)
    d = rng.normal(size=(32, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = d.astype(np.float32)
    res = march(ball_mesh, origins, d, max_steps=128)
    num = np.asarray(res.num_cells)
    assert (num > 0).all()
    t0 = np.asarray(res.t0)
    t1 = np.asarray(res.t1)
    _, t_out, _, _ = hull_intersect(ball_mesh, origins, d)
    t_out = np.asarray(t_out)
    for r in range(32):
        n = num[r]
        assert t0[r, 0] >= 0.0
        # Starts within the first crossed cell (entry < smallest cell size).
        assert t1[r, n - 1] == pytest.approx(float(t_out[r]), abs=1e-3)


def test_locate_points(ball_mesh, rng):
    # Hand-mix barycentric interior points of random cells; the located
    # cell must geometrically contain the point (cell ids can differ for
    # points near faces — the reference's own test sorts/relaxes ids too).
    cells = np.asarray(ball_mesh.cells)
    verts = np.asarray(ball_mesh.vertices)
    pick = rng.integers(0, len(cells), size=100)
    w = rng.dirichlet(np.ones(4) * 5.0, size=100).astype(np.float32)
    pts = np.einsum("sk,skd->sd", w, verts[cells[pick]])
    located = np.asarray(locate_points(ball_mesh, pts))
    assert (located >= 0).all()
    planes = np.asarray(ball_mesh.planes)
    ph = np.concatenate([pts, np.ones_like(pts[:, :1])], axis=1)
    bary = np.einsum("skd,sd->sk", planes[located], ph)
    assert bary.min() > -1e-3
    # Majority should be the exact cell.
    assert (located == pick).mean() > 0.8


def test_locate_points_outside(ball_mesh):
    pts = np.array([[5.0, 0.0, 0.0], [0.0, -4.0, 0.0]], np.float32)
    located = np.asarray(locate_points(ball_mesh, pts))
    np.testing.assert_array_equal(located, [-1, -1])


def test_match_samples_reprojection(ball_mesh, rng):
    """The reference's strongest invariant
    (``test_tetrahedra_tracer.py:204-207``): barycentric-interpolated
    vertex positions of matched samples must land back on the ray."""
    o, d = _random_outside_rays(rng, 32)
    res = march(ball_mesh, o, d, max_steps=128)
    t_in = np.asarray(res.t0[:, 0])
    num = np.asarray(res.num_cells)
    t_far = np.asarray(res.t1)[np.arange(len(o)), num - 1]
    s = np.linspace(0.05, 0.95, 64)[None, :]
    distances = (t_in[:, None] * (1 - s) + t_far[:, None] * s).astype(np.float32)
    out = match_samples(ball_mesh, res, distances, o, d)
    mask = np.asarray(out["mask"])
    assert mask.mean() > 0.99
    bary = np.asarray(out["barycentric"])  # [R, S, 4]
    vidx = np.asarray(out["vertex_indices"])
    verts = np.asarray(ball_mesh.vertices)
    interp = np.einsum("rsk,rskd->rsd", bary, verts[np.maximum(vidx, 0)])
    expected = o[:, None, :] + distances[..., None] * d[:, None, :]
    err = np.linalg.norm(interp - expected, axis=-1)[mask]
    assert err.max() < 1e-3
    # Barycentrics are a partition of unity and (near) nonnegative.
    np.testing.assert_allclose(bary.sum(-1)[mask], 1.0, atol=1e-3)
    assert bary[mask].min() > -1e-3


def test_trace_rays_api(ball_mesh, rng):
    o, d = _random_outside_rays(rng, 8)
    out = trace_rays(ball_mesh, o, d, max_visited_cells=100)
    assert out["visited_cells"].shape == (8, 100)
    assert out["visited_cells"].dtype == jnp.uint32
    assert out["barycentric_coordinates"].shape == (8, 100, 2, 3)
    assert out["hit_distances"].shape == (8, 100, 2)
    assert out["vertex_indices"].shape == (8, 100, 4)
    num = np.asarray(out["num_visited_cells"])
    cells = np.asarray(out["visited_cells"])
    for r in range(8):
        assert (cells[r, num[r]:] == 0xFFFFFFFF).all()
        assert (cells[r, : num[r]] != 0xFFFFFFFF).all()
    # Entry barycentrics of interval k+1 equal exit barycentrics of k only
    # in the shared face's coordinates; instead check partition of unity:
    bary = np.asarray(out["barycentric_coordinates"])
    w0 = 1.0 - bary.sum(-1)
    valid = cells != 0xFFFFFFFF
    assert np.abs(w0[valid] + bary[valid].sum(-1) - 1.0).max() < 1e-5


def test_find_visited_cells_matches_match_samples(ball_mesh, rng):
    """The API-parity lerp path must agree with the plane-table path."""
    o, d = _random_outside_rays(rng, 16)
    traced = trace_rays(ball_mesh, o, d, max_visited_cells=128)
    res = march(ball_mesh, o, d, max_steps=128)
    t_in = np.asarray(res.t0[:, 0])
    num = np.asarray(res.num_cells)
    t_far = np.asarray(res.t1)[np.arange(len(o)), num - 1]
    s = np.linspace(0.1, 0.9, 32)[None, :]
    distances = (t_in[:, None] * (1 - s) + t_far[:, None] * s).astype(np.float32)
    ref = find_visited_cells(
        traced["num_visited_cells"],
        traced["visited_cells"],
        traced["barycentric_coordinates"],
        traced["hit_distances"],
        traced["vertex_indices"],
        distances,
    )
    ours = match_samples(ball_mesh, res, distances, o, d)
    mask = np.asarray(ours["mask"])
    np.testing.assert_array_equal(np.asarray(ref["mask"]), mask)
    np.testing.assert_array_equal(
        np.asarray(ref["cell_indices"])[mask].astype(np.int64),
        np.asarray(ours["cell_indices"])[mask].astype(np.int64),
    )
    np.testing.assert_allclose(
        np.asarray(ref["barycentric_coordinates"])[mask],
        np.asarray(ours["barycentric"])[mask][:, 1:],
        atol=2e-3,
    )


def test_march_on_cospherical_cloud(rng):
    """EXACTLY cospherical points (all on the unit sphere): Qhull emits
    genuinely zero-volume simplices. They must stay in the complex
    (watertight adjacency; regularized plane tables forward rays with
    ~zero chord) — no silent interior termination."""
    pts = rng.standard_normal((400, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    mesh = build_mesh(pts)
    # No interior boundary faces: every −1 face's centroid is on the hull
    # (build_mesh would have raised otherwise; assert the premise too).
    assert (np.asarray(mesh.neighbors) >= -1).all()
    o, d = _random_outside_rays(rng, 48, radius=4.0, target_scale=0.2)
    res = march(mesh, o, d, max_steps=384)
    num = np.asarray(res.num_cells)
    t_in, t_out, _, hit = hull_intersect(mesh, o, d)
    assert np.asarray(hit).all()
    assert (num > 0).all()
    t1 = np.asarray(res.t1)
    t_out = np.asarray(t_out)
    covered = t1[np.arange(len(o)), np.maximum(num - 1, 0)]
    ok = (np.abs(covered - t_out) < 3e-2) | (num >= 380)
    assert ok.mean() > 0.95, (covered - t_out, num)


def test_build_mesh_rejects_holed_complex(ball_points):
    """Dropping an interior cell from a valid complex (the old
    degenerate-filter failure mode) must fail loudly, not silently
    terminate rays at the hole."""
    from tetranerf_tpu.geometry.delaunay import triangulate

    cells = triangulate(ball_points)
    neighbors = np.asarray(build_mesh(ball_points, cells).neighbors)
    # Pick a cell whose 4 faces are all interior (every neighbor >= 0).
    interior = np.nonzero((neighbors >= 0).all(axis=1))[0]
    assert len(interior) > 0
    holed = np.delete(cells, interior[0], axis=0)
    with pytest.raises(ValueError, match="watertight"):
        build_mesh(ball_points, holed)


def test_march_on_sliver_shell(shell_points, rng):
    """Surface-like cloud (thin shell + sparse interior): lots of sliver
    tetrahedra — the numerically nastiest case for a marcher. Rays must
    still cover their chords without getting lost."""
    mesh = build_mesh(shell_points)
    o, d = _random_outside_rays(rng, 48, radius=4.0, target_scale=0.2)
    res = march(mesh, o, d, max_steps=384)
    num = np.asarray(res.num_cells)
    assert (num > 0).all()
    t_in, t_out, _, hit = hull_intersect(mesh, o, d)
    assert np.asarray(hit).all()
    t1 = np.asarray(res.t1)
    t_out = np.asarray(t_out)
    covered = t1[np.arange(len(o)), num - 1]
    # Chord end reached (or the step budget genuinely exhausted).
    ok = (np.abs(covered - t_out) < 3e-2) | (num >= 380)
    assert ok.mean() > 0.95, (covered - t_out, num)
