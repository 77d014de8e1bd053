"""API-parity pipelines: find_tetrahedra, trace_rays_triangles, occupancy,
gather/scatter utilities, barycentric gradients.

Mirrors the reference's coverage in ``tests/test_tetrahedra_tracer.py``
(``test_find_tetrahedra`` exact barycentric recovery),
``test_tetrahedra_tracer_triangles.py`` (crossing/projection checks),
``test_uint32.py`` and ``test_barycentrics.py``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tetranerf_tpu.geometry import build_mesh
from tetranerf_tpu.ops import (
    barycentric_coordinates,
    add_barycentrics_grad,
    find_tetrahedra,
    gather_uint32,
    scatter_ema_uint32,
    trace_rays_triangles,
    update_occupancy,
)


@pytest.fixture(scope="module")
def ball_mesh(ball_points):
    return build_mesh(ball_points)


def test_find_tetrahedra_exact(ball_mesh, rng):
    """Hand-mixed barycentric points must be recovered (reference
    ``test_find_tetrahedra``, relaxing exact cell ids like the reference
    does by sorting/geometric checks)."""
    cells = np.asarray(ball_mesh.cells)
    verts = np.asarray(ball_mesh.vertices)
    pick = rng.integers(0, len(cells), 50)
    w = rng.dirichlet(np.ones(4) * 8.0, size=50).astype(np.float32)
    pts = np.einsum("sk,skd->sd", w, verts[cells[pick]])
    out = find_tetrahedra(ball_mesh, pts)
    assert np.asarray(out["valid_mask"]).all()
    # Interpolating vertex positions with returned barycentrics must
    # reproduce the query points.
    vidx = np.asarray(out["vertex_indices"]).astype(np.int64)
    b3 = np.asarray(out["barycentric_coordinates"])
    w4 = np.concatenate([1.0 - b3.sum(-1, keepdims=True), b3], axis=-1)
    recon = np.einsum("sk,skd->sd", w4, verts[vidx])
    np.testing.assert_allclose(recon, pts, atol=1e-4)
    # Points far outside are invalid.
    out2 = find_tetrahedra(ball_mesh, np.float32([[9, 9, 9]]))
    assert not np.asarray(out2["valid_mask"])[0]
    assert np.asarray(out2["tetrahedra"])[0] == -1


def test_trace_rays_triangles(ball_mesh, rng):
    o = rng.normal(size=(16, 3))
    o *= 3.0 / np.linalg.norm(o, axis=1, keepdims=True)
    t = rng.uniform(-0.3, 0.3, (16, 3))
    d = t - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = o.astype(np.float32), d.astype(np.float32)
    out = trace_rays_triangles(ball_mesh, o, d, max_hits=128)
    num = np.asarray(out["num_hits"])
    assert (num > 1).all()
    dist = np.asarray(out["hit_distances"])
    verts = np.asarray(out["vertex_indices"]).astype(np.int64)
    b2 = np.asarray(out["barycentric_coordinates"])
    vpos = np.asarray(ball_mesh.vertices)
    for r in range(16):
        n = num[r]
        # sorted distances
        assert (np.diff(dist[r, :n]) >= -1e-5).all()
        # interpolated crossing points lie on the ray (reference's
        # projection check, test_tetrahedra_tracer_triangles.py).
        w3 = np.concatenate(
            [1 - b2[r, :n].sum(-1, keepdims=True), b2[r, :n]], axis=-1
        )
        pts = np.einsum("sk,skd->sd", w3, vpos[verts[r, :n]])
        expect = o[r] + dist[r, :n, None] * d[r]
        assert np.abs(pts - expect).max() < 5e-3
        # padding
        assert (verts[r, n:] == 0xFFFFFFFF).all()


def test_gather_uint32():
    vals = jnp.asarray(np.arange(10, dtype=np.float32))
    idx = jnp.asarray(np.array([3, 7, 100, 0], dtype=np.uint32))
    out = np.asarray(gather_uint32(idx, vals))
    np.testing.assert_allclose(out, [3.0, 7.0, 0.0, 0.0])
    with pytest.raises(ValueError):
        gather_uint32(idx.reshape(2, 2), vals)


def test_scatter_ema_uint32():
    target = jnp.ones(5, jnp.float32)
    idx = jnp.asarray(np.array([0, 2, 9], dtype=np.uint32))
    vals = jnp.asarray(np.array([3.0, 5.0, 7.0], np.float32))
    out = np.asarray(scatter_ema_uint32(target, idx, vals, decay=0.5))
    np.testing.assert_allclose(out, [2.0, 1.0, 3.0, 1.0, 1.0])


def test_update_occupancy():
    occ = jnp.zeros(6)
    cells = jnp.asarray([[0, 2], [4, -1]], jnp.int32)
    w = jnp.asarray([[1.0, 1.0], [0.5, 9.9]])
    out = np.asarray(update_occupancy(occ, cells, w, decay=0.9))
    np.testing.assert_allclose(
        out, [0.1, 0.0, 0.1, 0.0, 0.05, 0.0], atol=1e-6
    )


def test_barycentric_gradients(rng):
    """Autodiff through the barycentric solve matches finite differences
    (the reference validates its analytic formulas the same way,
    tests/test_barycentrics.py)."""
    verts = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    point = jnp.asarray(rng.dirichlet(np.ones(4)).astype(np.float32) @ np.asarray(verts))

    def f(v, p):
        return jnp.sum(barycentric_coordinates(v, p) ** 2)

    gv, gp = jax.grad(f, argnums=(0, 1))(verts, point)
    eps = 1e-3
    for i in range(3):
        dp = np.zeros(3, np.float32)
        dp[i] = eps
        fd = (f(verts, point + dp) - f(verts, point - dp)) / (2 * eps)
        assert float(gp[i]) == pytest.approx(float(fd), abs=2e-2)
    # add_barycentrics_grad: identity forward, same gradients.
    b = barycentric_coordinates(verts, point)
    out = add_barycentrics_grad(b, verts, point)
    np.testing.assert_allclose(np.asarray(out), np.asarray(b), atol=1e-6)


def test_tracer_facade(ball_points, rng):
    """Reference-style object API: construct, load, trace, match."""
    from tetranerf_tpu.geometry import triangulate
    from tetranerf_tpu.tracer import TetrahedraTracer

    tracer = TetrahedraTracer()
    with pytest.raises(RuntimeError):
        tracer.trace_rays(np.zeros((1, 3), np.float32), np.ones((1, 3), np.float32))
    cells = triangulate(ball_points)
    tracer.load_tetrahedra(ball_points.astype(np.float32), cells)
    o = rng.normal(size=(8, 3))
    o *= 3.0 / np.linalg.norm(o, axis=1, keepdims=True)
    d = -o / np.linalg.norm(o, axis=1, keepdims=True)
    o, d = o.astype(np.float32), d.astype(np.float32)
    out = tracer.trace_rays(o, d, 100)
    assert (np.asarray(out["num_visited_cells"]) > 0).all()
    dist = np.asarray(out["hit_distances"])[:, :1, :].mean(-1)
    matched = tracer.find_visited_cells(
        out["num_visited_cells"],
        out["visited_cells"],
        out["barycentric_coordinates"],
        out["hit_distances"],
        out["vertex_indices"],
        jnp.asarray(dist),
    )
    assert np.asarray(matched["mask"]).all()
    located = tracer.find_tetrahedra(np.zeros((1, 3), np.float32))
    assert np.asarray(located["valid_mask"])[0]
    tri = tracer.trace_rays_triangles(o, d, 64)
    assert (np.asarray(tri["num_hits"]) > 1).all()
