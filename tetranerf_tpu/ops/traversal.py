"""Ray traversal over a tetrahedral mesh — the TPU replacement for OptiX.

The reference collects unordered triangle hits with an OptiX anyhit program,
bitonic-sorts them per ray, and pairs consecutive co-tetrahedron faces into
[entry, exit] intervals (``src/optix/optix_trace_rays.cu:268-331, 78-108,
110-266``). On TPU we instead *march*: a convex-hull slab test yields the
ray's [t_enter, t_exit] chord and entry facet; a short point-location walk
pins down the entry cell; then a fixed-bound ``lax.scan`` steps cell →
neighbor through the precomputed adjacency, emitting intervals already
sorted. This removes the sort, the face dedupe, and the power-of-two cap on
intersections, and it is branch-free/static-shape as XLA requires.

All functions are vectorized over rays and jit-compatible.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.mesh import TetrahedraMesh

INVALID_CELL = jnp.int32(-1)
# Matches the reference's padding value for visited_cells / vertex_indices
# (uint_max, ``optix_trace_rays.cu:260-265``) when exporting via trace_rays.
UINT_MAX = jnp.uint32(0xFFFFFFFF)

_BARY_EPS = 1e-5


class MarchResult(NamedTuple):
    """Sorted traversal intervals for a batch of rays.

    Interval ``k`` of ray ``r`` covers ``[t0[r, k], t1[r, k]]`` inside cell
    ``cells[r, k]``. Valid entries are the first ``num_cells[r]`` slots;
    the tail is padded with ``cells = -1``, ``t0 = t1 = +inf``.
    """

    cells: jnp.ndarray  # i32[R, T]
    t0: jnp.ndarray  # f32[R, T]
    t1: jnp.ndarray  # f32[R, T]
    num_cells: jnp.ndarray  # i32[R]


def _eval_planes(planes_c, points):
    """Evaluate barycentric planes at points: [..., 4, 4] x [..., 3] -> [..., 4].

    Deliberately an elementwise multiply-reduce (VPU, full f32) rather than
    an einsum: on TPU, dot_general lowers f32 to bf16 MXU passes by default,
    which destroys the precision these plane evaluations need.
    """
    return (
        jnp.sum(planes_c[..., :3] * points[..., None, :], axis=-1)
        + planes_c[..., 3]
    )


def hull_intersect(mesh: TetrahedraMesh, origins, directions):
    """Slab test of rays against the convex hull half-spaces.

    Returns ``(t_in, t_out, entry_facet, hit)``. For origins inside the
    hull ``t_in`` is negative. ``entry_facet`` indexes ``mesh.hull_eqs``.
    """
    n = mesh.hull_eqs[:, :3]  # [H, 3] outward
    d = mesh.hull_eqs[:, 3]  # [H]
    # precision='highest' keeps these f32 on the TPU MXU (default lowers
    # f32 matmuls to bf16 passes — fatal for near-tangent facets).
    num = jnp.matmul(origins, n.T, precision="highest") + d  # [R, H]
    den = jnp.matmul(directions, n.T, precision="highest")  # [R, H]
    t_hit = -num / jnp.where(den == 0.0, jnp.inf, den)
    # den < 0: ray moving inward through this plane -> lower bound.
    # den > 0: moving outward -> upper bound.
    lower = jnp.where(den < 0.0, t_hit, -jnp.inf)
    upper = jnp.where(den > 0.0, t_hit, jnp.inf)
    # den == 0: parallel; miss if outside that halfspace.
    parallel_miss = jnp.any((den == 0.0) & (num > 0.0), axis=-1)
    t_in = jnp.max(lower, axis=-1)
    t_out = jnp.min(upper, axis=-1)
    entry_facet = jnp.argmax(lower, axis=-1).astype(jnp.int32)
    hit = (t_in <= t_out) & ~parallel_miss & (t_out > 0.0)
    return t_in, t_out, entry_facet, hit


def _walk(mesh: TetrahedraMesh, cell, points, num_steps: int):
    """Straight point-location walk: move toward the most-negative
    barycentric face until the point is contained. Vectorized over points.

    Returns the containing cell, or -1 if the walk left the mesh.
    """

    def body(_, state):
        c, done = state
        c_safe = jnp.maximum(c, 0)
        planes_c = mesh.planes[c_safe]
        b = _eval_planes(planes_c, points)
        k = jnp.argmin(b, axis=-1)
        inside = jnp.take_along_axis(b, k[..., None], axis=-1)[..., 0] >= -_BARY_EPS
        nxt = mesh.neighbors[c_safe, k]
        new_c = jnp.where(done | inside, c, nxt)
        new_done = done | inside | (nxt < 0)
        return new_c, new_done

    done0 = cell < 0
    cell, done = jax.lax.fori_loop(0, num_steps, body, (cell, done0))
    # If the walk ran out of steps without containment, keep the last cell:
    # the subsequent march self-corrects within a step or two.
    return cell


def locate_points(mesh: TetrahedraMesh, points, num_steps: int = 64):
    """Find the tetrahedron containing each point (or -1).

    TPU-native replacement for the reference ``find_tetrahedra`` pipeline,
    which shoots ±x closest-hit rays and intersects their tetrahedra sets
    (``src/optix/optix_find_tetrahedra.cu:106-199``). Here: start from a
    cell incident to the nearest hull facet along +x and walk.
    """
    mesh = mesh.on_device()
    points = jnp.asarray(points)
    # Inside test against the hull.
    evals = (
        jnp.matmul(points, mesh.hull_eqs[:, :3].T, precision="highest")
        + mesh.hull_eqs[:, 3]
    )
    inside_hull = jnp.max(evals, axis=-1) <= _BARY_EPS
    # Seed: walk from the cell of the hull facet the +x ray exits through.
    dirs = jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0], points.dtype), points.shape
    )
    den = jnp.matmul(dirs, mesh.hull_eqs[:, :3].T, precision="highest")
    t_hit = -evals / jnp.where(den == 0.0, jnp.inf, den)
    upper = jnp.where(den > 0.0, t_hit, jnp.inf)
    exit_facet = jnp.argmin(upper, axis=-1)
    seed = mesh.hull_cells[exit_facet]
    cell = _walk(mesh, jnp.where(inside_hull, seed, -1), points, num_steps)
    # Validate containment.
    planes_c = mesh.planes[jnp.maximum(cell, 0)]
    b = _eval_planes(planes_c, points)
    contained = (jnp.min(b, axis=-1) >= -_BARY_EPS) & (cell >= 0)
    return jnp.where(contained, cell, -1)


def march(
    mesh: TetrahedraMesh,
    origins,
    directions,
    max_steps: int = 512,
    near: float = 0.0,
    entry_walk_steps: int = 16,
) -> MarchResult:
    """Trace rays through the mesh, emitting sorted traversal intervals.

    Intervals whose entry lies before ``near`` are dropped, matching the
    reference semantics where the partial cell containing the ray origin is
    never reported (OptiX records crossings at t>0 only and pairing needs
    both faces; ``optix_trace_rays.cu:110-266``).
    """
    mesh = mesh.on_device()
    origins = jnp.asarray(origins)
    directions = jnp.asarray(directions)

    # The f32 hull slab suffers catastrophic error amplification on
    # near-tangent facets (t error up to ~1e-2·span), so it is used only to
    # (a) reject misses and (b) seed a point slightly inside the hull. The
    # exact chord entry is then recovered *locally* from the entry cell's
    # plane table, which is well conditioned.
    t_in, t_out, entry_facet, hit = hull_intersect(mesh, origins, directions)
    span = jnp.maximum(t_out - t_in, 1e-30)
    eps_t = 1e-3 * span + 1e-7
    p_entry = origins + (t_in + eps_t)[:, None] * directions
    seed = jnp.where(hit, mesh.hull_cells[entry_facet], -1)
    entry_cell = _walk(mesh, seed, p_entry, entry_walk_steps)

    def _crossings(c_safe, t):
        """Per-face ray crossing distances from the current position.

        Evaluating barycentrics at the current point (not the possibly
        far-away origin) keeps the computation locally conditioned.
        """
        planes_c = mesh.planes[c_safe]  # [R, 4, 4]
        p = origins + t[:, None] * directions
        b = _eval_planes(planes_c, p)  # bary at current point
        den = jnp.sum(
            planes_c[..., :3] * directions[:, None, :], axis=-1
        )  # VPU mul-reduce: keep f32 (see _eval_planes)
        return b, den, t[:, None] - b / jnp.where(den == 0.0, jnp.inf, den)

    # Exact local entry: the latest crossing of an *increasing* barycentric
    # (the face the ray entered through) of the entry cell.
    c0_safe = jnp.maximum(entry_cell, 0)
    _, den0, t_cross0 = _crossings(c0_safe, t_in + eps_t)
    t_entry = jnp.max(jnp.where(den0 > 0.0, t_cross0, -jnp.inf), axis=-1)
    t_entry = jnp.where(jnp.isfinite(t_entry), t_entry, t_in)

    t_cap = t_out + eps_t  # safety net only; boundary faces terminate rays

    def step(state, _):
        c, t, done = state
        c_safe = jnp.maximum(c, 0)
        _, den, t_cross = _crossings(c_safe, t)
        # Exit through the nearest decreasing-barycentric face.
        t_k = jnp.where(den < 0.0, t_cross, jnp.inf)
        k_exit = jnp.argmin(t_k, axis=-1)
        t_exit_raw = jnp.min(t_k, axis=-1)
        found = jnp.isfinite(t_exit_raw)
        t_exit = jnp.maximum(t_exit_raw, t)  # monotonic despite roundoff
        nxt = mesh.neighbors[c_safe, k_exit]
        valid = ~done & found & (c >= 0)
        emit = (jnp.where(valid, c, INVALID_CELL), t, jnp.where(valid, t_exit, jnp.inf))
        new_done = done | ~found | (nxt < 0) | (t_exit >= t_cap)
        return (jnp.where(valid, nxt, c), jnp.where(valid, t_exit, t), new_done), emit

    init = (entry_cell, t_entry, ~hit | (entry_cell < 0))
    _, (cells, t0s, t1s) = jax.lax.scan(
        step, init, None, length=max_steps
    )
    cells = cells.T  # [R, T]
    t0s = t0s.T
    t1s = t1s.T

    valid = cells >= 0
    # Drop intervals entirely behind the near plane (origin-inside-hull
    # rays start marching at t_in < 0). Valid intervals are a contiguous
    # prefix with increasing t0, so this is a per-ray shift.
    keep = valid & (t0s >= near)
    drop = jnp.sum(valid & ~keep, axis=-1, keepdims=True)  # [R, 1]
    idx = jnp.arange(max_steps)[None, :] + drop
    idx_c = jnp.minimum(idx, max_steps - 1)
    in_range = idx < max_steps
    cells = jnp.where(
        in_range, jnp.take_along_axis(cells, idx_c, axis=1), INVALID_CELL
    )
    t0s = jnp.where(in_range, jnp.take_along_axis(t0s, idx_c, axis=1), jnp.inf)
    t1s = jnp.where(in_range, jnp.take_along_axis(t1s, idx_c, axis=1), jnp.inf)
    valid = cells >= 0
    t0s = jnp.where(valid, t0s, jnp.inf)
    num_cells = jnp.sum(valid, axis=-1).astype(jnp.int32)
    return MarchResult(cells=cells, t0=t0s, t1=t1s, num_cells=num_cells)


def trace_rays(
    mesh: TetrahedraMesh,
    origins,
    directions,
    max_visited_cells: int = 512,
    near: float = 0.0,
):
    """API-parity tracer: returns the reference's ``trace_rays`` dict.

    Output schema mirrors ``src/py_binding.cpp:53-76``:
      - ``num_visited_cells``: i32[R]
      - ``visited_cells``: u32[R, T] (UINT_MAX padded)
      - ``barycentric_coordinates``: f32[R, T, 2, 3] entry/exit barycentric
        weights of vertices 1..3 (weight of vertex 0 = 1 - sum)
      - ``hit_distances``: f32[R, T, 2]
      - ``vertex_indices``: u32[R, T, 4]

    Unlike the reference, ``max_visited_cells`` need not be a power of two
    (no bitonic sort here).
    """
    res = march(mesh, origins, directions, max_visited_cells, near)
    valid = res.cells >= 0
    c_safe = jnp.maximum(res.cells, 0)
    planes_c = mesh.planes[c_safe]  # [R, T, 4, 4]
    origins = jnp.asarray(origins)
    directions = jnp.asarray(directions)
    t0 = jnp.where(valid, res.t0, 0.0)
    t1 = jnp.where(valid, res.t1, 0.0)
    p_entry = origins[:, None, :] + t0[..., None] * directions[:, None, :]
    p_exit = origins[:, None, :] + t1[..., None] * directions[:, None, :]
    bary_entry = _eval_planes(planes_c, p_entry)[..., 1:]  # [R, T, 3]
    bary_exit = _eval_planes(planes_c, p_exit)[..., 1:]
    bary = jnp.stack([bary_entry, bary_exit], axis=-2)  # [R, T, 2, 3]
    bary = jnp.where(valid[..., None, None], bary, 0.0)
    vertex_indices = jnp.where(
        valid[..., None],
        mesh.cells[c_safe].astype(jnp.uint32),
        UINT_MAX,
    )
    visited = jnp.where(valid, res.cells.astype(jnp.uint32), UINT_MAX)
    hit_distances = jnp.stack([t0, t1], axis=-1)
    return {
        "num_visited_cells": res.num_cells,
        "visited_cells": visited,
        "barycentric_coordinates": bary,
        "hit_distances": hit_distances,
        "vertex_indices": vertex_indices,
    }
