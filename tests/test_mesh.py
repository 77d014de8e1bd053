"""Mesh structure tests: adjacency, barycentric plane tables, hull."""

import numpy as np
import pytest

from tetranerf_tpu.geometry import build_adjacency, build_mesh, triangulate
from tetranerf_tpu.geometry.mesh import compute_planes


def test_adjacency_cube(cube_mesh):
    vertices, cells = cube_mesh
    neighbors = build_adjacency(cells)
    assert neighbors.shape == (12, 4)
    # Each tet has exactly one boundary face (the one opposite the center
    # vertex 8) and three internal neighbors.
    boundary_counts = (neighbors < 0).sum(axis=1)
    np.testing.assert_array_equal(boundary_counts, np.ones(12))
    # The boundary face must be the one opposite vertex index 3 (the center
    # is always the 4th vertex in the fixture).
    assert (neighbors[:, 3] < 0).all()
    # Symmetry: if b is a neighbor of a, a is a neighbor of b.
    for c in range(12):
        for k in range(4):
            n = neighbors[c, k]
            if n >= 0:
                assert c in neighbors[n]


def test_adjacency_matches_scipy(ball_points):
    from scipy.spatial import Delaunay

    tri = Delaunay(ball_points)
    cells = tri.simplices.astype(np.int32)
    ours = build_adjacency(cells)
    np.testing.assert_array_equal(ours, tri.neighbors.astype(np.int32))


def test_adjacency_rejects_overshared_face():
    cells = np.array([[0, 1, 2, 3], [0, 1, 2, 4], [0, 1, 2, 5]], np.int32)
    with pytest.raises(ValueError):
        build_adjacency(cells)


def test_planes_are_barycentric(ball_points, rng):
    cells = triangulate(ball_points)
    planes = compute_planes(ball_points, cells)
    assert planes.shape == (len(cells), 4, 4)
    # b_k(v_j) = delta_kj for every cell.
    sub = rng.integers(0, len(cells), size=200)
    v = ball_points[cells[sub]].astype(np.float32)  # [S, 4, 3]
    vh = np.concatenate([v, np.ones_like(v[..., :1])], -1)  # [S, 4, 4]
    evals = np.einsum("skd,sjd->skj", planes[sub], vh)
    np.testing.assert_allclose(evals, np.tile(np.eye(4), (200, 1, 1)), atol=1e-3)
    # Barycentrics of interior points sum to 1 and reproduce the point.
    w = rng.dirichlet(np.ones(4), size=200).astype(np.float32)
    pts = np.einsum("sk,skd->sd", w, v)
    pth = np.concatenate([pts, np.ones_like(pts[..., :1])], -1)
    bary = np.einsum("skd,sd->sk", planes[sub], pth)
    np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-3)
    np.testing.assert_allclose(bary, w, atol=1e-2)


def test_build_mesh(ball_points):
    mesh = build_mesh(ball_points)
    assert mesh.num_vertices == len(ball_points)
    assert mesh.neighbors.shape == (mesh.num_cells, 4)
    assert mesh.planes.shape == (mesh.num_cells, 4, 4)
    assert mesh.hull_eqs.shape[0] == mesh.hull_cells.shape[0]
    assert mesh.hull_eqs.shape[0] > 3
    # All vertices satisfy every hull half-space (inside or on boundary).
    eqs = np.asarray(mesh.hull_eqs, dtype=np.float64)
    verts = np.asarray(mesh.vertices, dtype=np.float64)
    evals = verts @ eqs[:, :3].T + eqs[None, :, 3]
    assert evals.max() < 1e-4
    # Hull seed cells are valid cell indices.
    hull_cells = np.asarray(mesh.hull_cells)
    assert hull_cells.min() >= 0 and hull_cells.max() < mesh.num_cells
    # vertex_cells: every seeded cell is actually incident to the vertex.
    cells = np.asarray(mesh.cells)
    vc = np.asarray(mesh.vertex_cells)
    incident = (cells[vc] == np.arange(mesh.num_vertices)[:, None]).any(1)
    assert incident.all()


def test_mesh_is_pytree(cube_mesh):
    import jax

    vertices, cells = cube_mesh
    mesh = build_mesh(vertices, cells)
    leaves = jax.tree_util.tree_leaves(mesh)
    assert len(leaves) == 11  # + skip_table/skip_meta
    mesh2 = jax.tree_util.tree_map(lambda x: x, mesh)
    assert mesh2.num_cells == mesh.num_cells


def test_slim_mesh_march_parity(ball_points):
    """march_features on a slim mesh (packed-row walk, no unpacked
    planes/neighbors on device) is bit-identical to the full mesh."""
    import jax.numpy as jnp

    from tetranerf_tpu.ops.fused import march_features

    mesh = build_mesh(ball_points)
    slim = mesh.slim()
    assert slim.planes.shape[0] == 0 and slim.neighbors.shape[0] == 0
    # Pytree structure unchanged (jit signature compatibility).
    import jax

    assert jax.tree_util.tree_structure(slim) == jax.tree_util.tree_structure(mesh)

    rng = np.random.default_rng(3)
    o = rng.normal(size=(32, 3))
    o = (o * (3.0 / np.linalg.norm(o, axis=1, keepdims=True))).astype(np.float32)
    d = (-o / np.linalg.norm(o, axis=1, keepdims=True)).astype(np.float32)
    field = jnp.asarray(
        rng.normal(size=(mesh.num_vertices, 8)), jnp.float32
    )
    full = march_features(mesh, field, o, d, max_steps=64)
    thin = march_features(slim, field, o, d, max_steps=64)
    np.testing.assert_array_equal(np.asarray(full.cells), np.asarray(thin.cells))
    np.testing.assert_array_equal(np.asarray(full.t1), np.asarray(thin.t1))
    np.testing.assert_array_equal(
        np.asarray(full.feats), np.asarray(thin.feats)
    )


def test_build_mesh_tables_stay_on_host(ball_points):
    """build_mesh must return HOST (numpy) tables: the long-lived
    model.mesh reference must not pin the full tables in device HBM
    (consumers device_put what they need once)."""
    mesh = build_mesh(ball_points)
    import dataclasses

    for f in dataclasses.fields(mesh):
        assert isinstance(getattr(mesh, f.name), np.ndarray), f.name
