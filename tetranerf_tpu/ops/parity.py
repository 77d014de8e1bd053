"""API-parity wrappers matching the reference's auxiliary pipelines.

These cover the reference APIs that the training forward path does not
use but which are part of its public surface and test coverage:

- :func:`find_tetrahedra` — the point-location pipeline
  (``src/optix/optix_find_tetrahedra.cu``, exposed at
  ``src/py_binding.cpp:115-142``). The reference shoots ±x closest-hit
  rays and intersects the hit faces' tetrahedra sets; here a point walk
  (``locate_points``) answers exactly, and barycentrics come from the
  plane table.
- :func:`trace_rays_triangles` — the triangle-crossing tracer
  (``src/optix/optix_trace_rays_triangles.cu``, binding
  ``py_binding.cpp:855-1128``): per-hit face vertex ids, 2D face
  barycentrics, and distances, sorted along the ray. Derived from the
  marcher: crossing ``k`` is the exit face of interval ``k`` (plus the
  entry face of the first interval).
- :func:`update_occupancy` — the per-cell EMA occupancy update the
  reference's ``scatter_ema_uint32`` kernel was built for
  (``src/tetrahedra_tracer.cu:55-113``; the model keeps the buffer at
  ``model.py:256-265`` but never writes it).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.mesh import TetrahedraMesh
from .traversal import UINT_MAX, _eval_planes, locate_points, march


def find_tetrahedra(mesh: TetrahedraMesh, points, num_steps: int = 64):
    """Locate points in the mesh; reference-shaped output dict
    (``py_binding.cpp:137-141``): ``tetrahedra i32[N]`` (-1 = outside),
    ``barycentric_coordinates f32[N, 3]`` (vertices 1..3),
    ``vertex_indices u32[N, 4]``, ``valid_mask bool[N]``."""
    mesh = mesh.on_device()
    points = jnp.asarray(points)
    cells = locate_points(mesh, points, num_steps)
    valid = cells >= 0
    safe = jnp.maximum(cells, 0)
    bary = _eval_planes(mesh.planes[safe], points)
    bary = jnp.where(valid[:, None], bary, 0.0)
    vertex_indices = jnp.where(
        valid[:, None], mesh.cells[safe].astype(jnp.uint32), UINT_MAX
    )
    return {
        "tetrahedra": cells,
        "barycentric_coordinates": bary[:, 1:],
        "vertex_indices": vertex_indices,
        "valid_mask": valid,
    }


_FACE_VERTS = jnp.array(
    [[1, 2, 3], [0, 2, 3], [0, 1, 3], [0, 1, 2]], jnp.int32
)


def trace_rays_triangles(
    mesh: TetrahedraMesh, origins, directions, max_hits: int = 512
):
    """All triangle-face crossings along each ray, sorted by distance.

    Returns ``num_hits i32[R]``, ``hit_distances f32[R, H]``,
    ``vertex_indices u32[R, H, 3]`` (the crossed face's vertices), and
    ``barycentric_coordinates f32[R, H, 2]`` (weights of face vertices
    1..2; vertex 0 is ``1 - sum``). Crossing ``0`` is the entry into the
    first cell; crossing ``k+1`` exits interval ``k``.
    """
    mesh = mesh.on_device()
    origins = jnp.asarray(origins)
    directions = jnp.asarray(directions)
    res = march(mesh, origins, directions, max_steps=max_hits - 1)
    num_rays, max_t = res.cells.shape
    valid = res.cells >= 0
    safe = jnp.maximum(res.cells, 0)
    planes_c = mesh.planes[safe]  # [R, T, 4, 4]

    def face_crossing(planes_sub, cells_sub, valid_sub, t_at, which):
        p = origins[:, None, :] + jnp.where(valid_sub, t_at, 0.0)[
            ..., None
        ] * directions[:, None, :]
        bary = _eval_planes(planes_sub, p)  # [R, S, 4]
        # The crossed face is the (near-)zero barycentric: smallest |b|,
        # restricted to decreasing (exit) / increasing (entry) faces.
        den = jnp.sum(
            planes_sub[..., :3] * directions[:, None, None, :], axis=-1
        )
        sign = -den if which == "exit" else den
        score = jnp.where(sign > 0, jnp.abs(bary), jnp.inf)
        face = jnp.argmin(score, axis=-1)  # [R, S]
        fv = _FACE_VERTS[face]  # [R, S, 3]
        verts = jnp.take_along_axis(cells_sub, fv, axis=-1)
        wf = jnp.take_along_axis(bary, fv, axis=-1)  # [R, S, 3]
        wf = wf / jnp.maximum(jnp.sum(wf, axis=-1, keepdims=True), 1e-12)
        return verts, wf

    cell_verts = mesh.cells[safe]  # [R, T, 4]
    exit_verts, exit_w = face_crossing(
        planes_c, cell_verts, valid, res.t1, "exit"
    )
    entry_verts, entry_w = face_crossing(
        planes_c[:, :1],
        cell_verts[:, :1],
        valid[:, :1],
        res.t0[:, :1],
        "entry",
    )

    first_valid = valid[:, :1]
    distances = jnp.concatenate([res.t0[:, :1], res.t1], axis=1)
    verts = jnp.concatenate([entry_verts, exit_verts], axis=1)
    weights = jnp.concatenate([entry_w, exit_w], axis=1)
    hit_valid = jnp.concatenate([first_valid, valid], axis=1)

    num_hits = jnp.sum(hit_valid, axis=-1).astype(jnp.int32)
    distances = jnp.where(hit_valid, distances, jnp.inf)
    verts = jnp.where(hit_valid[..., None], verts.astype(jnp.uint32), UINT_MAX)
    weights = jnp.where(hit_valid[..., None], weights, 0.0)
    return {
        "num_hits": num_hits,
        "hit_distances": distances,
        "vertex_indices": verts,
        "barycentric_coordinates": weights[..., 1:],
    }


def update_occupancy(occupancy, cell_indices, values, decay: float = 0.95):
    """EMA-update per-cell occupancy from per-sample rendering weights.

    ``occupancy[c] = decay * occupancy[c] + (1 - decay) * value`` for each
    sampled cell (duplicates keep one update, matching XLA scatter
    semantics; the reference's CAS loop is likewise order-nondeterministic).
    """
    occupancy = jnp.asarray(occupancy)
    flat_idx = jnp.asarray(cell_indices).reshape(-1)
    flat_val = jnp.asarray(values).reshape(-1).astype(occupancy.dtype)
    valid = flat_idx >= 0
    read = jnp.where(valid, flat_idx, 0)
    updated = decay * occupancy[read] + (1.0 - decay) * flat_val
    # Invalid cells scatter out of bounds and are dropped.
    write = jnp.where(valid, read, occupancy.shape[0])
    return occupancy.at[write].set(updated, mode="drop")
