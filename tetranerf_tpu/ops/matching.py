"""Sample-to-cell matching.

Replaces the reference's ``find_matched_cells_kernel``
(``src/tetrahedra_tracer.cu:115-193``): a per-ray two-pointer sweep over
sorted intervals vs. sorted sample distances. The two-pointer logic is
exactly a ``searchsorted`` over interval exit distances plus an
in-interval mask, which XLA vectorizes across the whole batch.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.mesh import TetrahedraMesh
from .traversal import MarchResult, UINT_MAX, _eval_planes


def _searchsorted_rows(sorted_rows, values):
    # Compare-sum beats vmapped binary search on TPU (vectorized, no
    # per-element dynamic gathers).
    return jnp.sum(
        (sorted_rows[:, None, :] <= values[:, :, None]).astype(jnp.int32),
        axis=-1,
    )


def match_samples(
    mesh: TetrahedraMesh,
    res: MarchResult,
    distances,
    origins,
    directions,
):
    """Match sample distances to traversal intervals (hot path).

    Args:
        res: march result with contiguous sorted intervals.
        distances: ``f32[R, S]`` sorted sample distances along each ray.

    Returns dict with ``cell_indices i32[R, S]``, ``vertex_indices
    i32[R, S, 4]``, ``mask bool[R, S]`` and full 4-weight ``barycentric
    f32[R, S, 4]`` computed directly from the plane tables (equal to the
    reference's entry/exit lerp, which is exact because barycentrics are
    affine along the ray; ``src/tetrahedra_tracer.cu:150-156``).
    """
    mesh = mesh.on_device()
    distances = jnp.asarray(distances)
    k = _searchsorted_rows(res.t1, distances)  # first interval with t1 > d
    max_t = res.cells.shape[1]
    k_c = jnp.minimum(k, max_t - 1)
    cell = jnp.take_along_axis(res.cells, k_c, axis=1)
    t0k = jnp.take_along_axis(res.t0, k_c, axis=1)
    mask = (k < res.num_cells[:, None]) & (distances >= t0k) & (cell >= 0)
    c_safe = jnp.maximum(cell, 0)
    planes_c = mesh.planes[c_safe]  # [R, S, 4, 4]
    points = (
        jnp.asarray(origins)[:, None, :]
        + distances[..., None] * jnp.asarray(directions)[:, None, :]
    )
    bary = _eval_planes(planes_c, points)  # [R, S, 4]
    bary = jnp.where(mask[..., None], bary, 0.0)
    vertex_indices = jnp.where(
        mask[..., None], mesh.cells[c_safe], -1
    )
    return {
        "cell_indices": jnp.where(mask, cell, -1),
        "vertex_indices": vertex_indices,
        "mask": mask,
        "barycentric": bary,
    }


def find_visited_cells(
    num_visited_cells,
    visited_cells,
    barycentric_coordinates,
    hit_distances,
    vertex_indices,
    distances,
):
    """API-parity port of the reference ``find_visited_cells``
    (``src/py_binding.cpp:163-216`` → ``find_matched_cells_kernel``).

    Operates purely on tracer outputs (no mesh needed): barycentrics are
    linearly interpolated between the stored entry/exit coordinates by
    ``(d - t0) / (t1 - t0)``.

    Returns ``cell_indices u32[R, S]``, ``vertex_indices u32[R, S, 4]``,
    ``mask bool[R, S]``, ``barycentric_coordinates f32[R, S, 3]``.
    """
    distances = jnp.asarray(distances)
    t0 = hit_distances[..., 0]
    t1 = hit_distances[..., 1]
    num = jnp.asarray(num_visited_cells).astype(jnp.int32)
    max_t = t1.shape[1]
    t1_sorted = jnp.where(
        jnp.arange(max_t)[None, :] < num[:, None], t1, jnp.inf
    )
    k = _searchsorted_rows(t1_sorted, distances)
    k_c = jnp.minimum(k, max_t - 1)
    t0k = jnp.take_along_axis(t0, k_c, axis=1)
    t1k = jnp.take_along_axis(t1, k_c, axis=1)
    mask = (k < num[:, None]) & (distances >= t0k)
    frac = (distances - t0k) / jnp.maximum(t1k - t0k, 1e-20)
    frac = jnp.clip(frac, 0.0, 1.0)[..., None]
    b_entry = jnp.take_along_axis(
        barycentric_coordinates[..., 0, :], k_c[..., None], axis=1
    )
    b_exit = jnp.take_along_axis(
        barycentric_coordinates[..., 1, :], k_c[..., None], axis=1
    )
    bary = b_entry + frac * (b_exit - b_entry)
    bary = jnp.where(mask[..., None], bary, 0.0)
    cells = jnp.take_along_axis(visited_cells, k_c, axis=1)
    verts = jnp.take_along_axis(vertex_indices, k_c[..., None], axis=1)
    cells = jnp.where(mask, cells, UINT_MAX)
    verts = jnp.where(mask[..., None], verts, UINT_MAX)
    return {
        "cell_indices": cells,
        "vertex_indices": verts,
        "mask": mask,
        "barycentric_coordinates": bary,
    }
