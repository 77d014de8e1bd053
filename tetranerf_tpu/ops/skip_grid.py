"""Empty-space skipping: a voxel distance grid over the tetrahedra mesh.

Motivation: the march pays one sequential row-gather per crossed cell
(docs/RESULTS.md "speed-of-light" — throughput is ``gather_wall /
T_eff``). In real COLMAP/Blender scenes most crossed cells are big empty
tetrahedra between the hull and the first surface — and rays that miss
the (non-convex) object entirely march their full hull chord, pinning
the traversal bound for the whole batch. The reference gets empty-space
culling for free from its OptiX BVH (``src/tetrahedra_tracer.cpp:285-332``
builds a GAS over the face soup; rays with no hits cost nothing). The
TPU-native equivalent is a *sphere-trace* through a precomputed
free-space distance grid:

1. Voxelize the per-cell occupancy EMA onto a ``[G, G, G]`` grid
   (conservatively: every voxel whose center lies in a cell takes that
   cell's occupancy via the precomputed *anchor* table; small cells
   additionally scatter to their vertices' and centroid's voxels; the
   mask is then dilated by one voxel).
2. Compute the CHEBYSHEV distance transform of the occupied mask
   (iterated separable 3-wide min-pool). Chebyshev voxel distance is a
   *lower bound* on Euclidean point distance: if ``d_cheb(v) = k``,
   every point within L∞ radius ``(k-1)·h`` of any point in voxel ``v``
   lies in a free voxel — so a ray at any position inside ``v`` can
   safely advance ``rho = (k-1)·h_min`` without crossing estimated
   density.
3. The march (``ops/fused.march_features``) sphere-traces from the hull
   entry: gather ``rho`` at the current position's voxel, advance by it,
   repeat while ``rho > 0``. Each grid gather replaces up to
   ``rho / cell_size`` sequential march-row gathers. Rays whose trace
   exits the hull never march at all (the miss-ray fast path). The trace
   stops one voxel short of estimated density; the ray is then
   re-localized into the containing cell via the voxel's anchor + a
   short walk, and the normal march takes over.

The skipped span carries estimated density ≤ ``skip_eps`` (default
1e-3): the optical depth forfeited over a full chord is ``< skip_eps *
chord`` — far below the termination threshold the renderer already
applies. Cells whose density later grows re-enter coverage at the next
occupancy refresh (the EMA + grid rebuild every
``occupancy_refresh_every`` steps), exactly like Instant-NGP's
occupancy-grid maintenance.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SkipSetup(NamedTuple):
    """Static (geometry-only) precomputation for the skip grid.

    Built once per mesh; only the per-refresh occupancy changes after.
    """

    anchors: jnp.ndarray  # i32[G, G, G] cell containing voxel center (-1 = outside hull)
    loc_anchors: jnp.ndarray  # i32[G, G, G] anchor with nearest-vertex-cell fallback (always >= 0)
    vert_vox: jnp.ndarray  # i32[4C] flat voxel index of each cell's 4 vertices
    cent_vox: jnp.ndarray  # i32[C] flat voxel index of each cell centroid
    meta: jnp.ndarray  # f32[8]: lo(3) | 1/h(3) | h_min | 0


def grid_geometry(vertices: np.ndarray, resolution: int):
    """Voxel grid ``lo``/``h`` covering the hull AABB with a half-voxel
    margin (so clamped indexing never maps an inside point to a voxel
    whose extent excludes it)."""
    v = np.asarray(vertices, np.float64)
    lo = v.min(axis=0)
    hi = v.max(axis=0)
    span = np.maximum(hi - lo, 1e-9)
    h = span / (resolution - 1)  # half-voxel margin on both sides
    lo = lo - 0.5 * h
    return lo.astype(np.float32), h.astype(np.float32)


def _voxel_of(points: np.ndarray, lo, h, resolution: int) -> np.ndarray:
    ij = np.clip(
        ((np.asarray(points, np.float64) - lo) / h).astype(np.int64),
        0,
        resolution - 1,
    )
    g = resolution
    return (ij[..., 0] * g * g + ij[..., 1] * g + ij[..., 2]).astype(np.int32)


def make_skip_setup(mesh, resolution: int = 64, march_table=None) -> SkipSetup:
    """One-time skip-grid precomputation (host kNN + device walks).

    ``mesh`` must carry the full host tables (``cells``, ``vertices``,
    ``vertex_cells``); pass ``march_table`` to reuse an already
    device-resident copy for the point-location walks."""
    from scipy.spatial import cKDTree

    from .fused import _walk_packed

    g = resolution
    vertices = np.asarray(mesh.vertices, np.float64)
    cells = np.asarray(mesh.cells)
    lo, h = grid_geometry(vertices, g)
    axes = [lo[a] + (np.arange(g) + 0.5) * h[a] for a in range(3)]
    centers = np.stack(
        np.meshgrid(*axes, indexing="ij"), axis=-1
    ).reshape(-1, 3)

    # Walk seeds: a cell incident to the voxel center's nearest vertex.
    _, nearest = cKDTree(vertices).query(centers, workers=-1)
    seeds = np.asarray(mesh.vertex_cells)[nearest].astype(np.int32)

    # Point-locate every voxel center (device, chunked): -1 = outside hull.
    table = jnp.asarray(
        mesh.march_table if march_table is None else march_table
    )
    chunk = 65536
    pad = -(-len(centers) // chunk) * chunk
    c_pad = np.zeros((pad, 3), np.float32)
    c_pad[: len(centers)] = centers
    s_pad = np.zeros((pad,), np.int32)
    s_pad[: len(centers)] = seeds

    @jax.jit
    def locate(table, pts, sds):
        return jax.lax.map(
            lambda args: _walk_packed(table, args[1], args[0], 48),
            (pts, sds),
        )

    anchors = np.asarray(
        locate(
            table,
            jnp.asarray(c_pad.reshape(-1, chunk, 3)),
            jnp.asarray(s_pad.reshape(-1, chunk)),
        )
    ).reshape(-1)[: len(centers)]
    loc_anchors = np.where(anchors >= 0, anchors, seeds).astype(np.int32)

    centroids = vertices[cells].mean(axis=1)
    vert_vox = _voxel_of(
        vertices[cells.reshape(-1)], lo, h, g
    )  # [4C]
    cent_vox = _voxel_of(centroids, lo, h, g)  # [C]

    meta = np.zeros(8, np.float32)
    meta[:3] = lo
    meta[3:6] = 1.0 / h
    meta[6] = float(h.min())
    return SkipSetup(
        anchors=jnp.asarray(anchors.reshape(g, g, g)),
        loc_anchors=jnp.asarray(loc_anchors.reshape(g, g, g)),
        vert_vox=jnp.asarray(vert_vox),
        cent_vox=jnp.asarray(cent_vox),
        meta=jnp.asarray(meta),
    )


def chebyshev_distance(occupied: jnp.ndarray, max_dist: int) -> jnp.ndarray:
    """Chebyshev (L∞) voxel distance to the occupied set, capped at
    ``max_dist`` — iterated separable 3-wide min-pools (each iteration
    propagates distance one voxel in every direction at once)."""
    cap = jnp.float32(max_dist)
    d = jnp.where(occupied, 0.0, cap)

    def min3(x, axis):
        lo = jnp.concatenate(
            [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
             jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)],
            axis=axis,
        )
        hi = jnp.concatenate(
            [jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis),
             jax.lax.slice_in_dim(
                 x, x.shape[axis] - 1, x.shape[axis], axis=axis
             )],
            axis=axis,
        )
        return jnp.minimum(x, jnp.minimum(lo, hi))

    def body(_, d):
        m = min3(min3(min3(d, 0), 1), 2)
        return jnp.minimum(d, m + 1.0)

    return jax.lax.fori_loop(0, max_dist, body, d)


def build_skip_table(
    occ: jnp.ndarray,
    setup: SkipSetup,
    skip_eps: float = 1e-3,
    max_skip_voxels: int = 16,
) -> jnp.ndarray:
    """Per-refresh skip table ``f32[G, G, G, 8]`` from the occupancy EMA.

    Column 0: safe advance distance ``rho`` (0 in/near estimated
    density — the march must walk there). Column 1: the localization
    anchor cell id (i32 bit-cast). Rows are padded to 8 floats (narrow
    rows gather slower on TPU, ``docs/RESULTS.md``).
    """
    g = setup.anchors.shape[0]
    occ = jnp.asarray(occ, jnp.float32)
    # Conservative voxelization: anchor coverage (every voxel whose
    # center is inside a cell) + vertex/centroid scatter (sub-voxel
    # cells straddling a voxel whose center lies elsewhere).
    anchors_flat = setup.anchors.reshape(-1)
    grid = jnp.where(
        anchors_flat >= 0, occ[jnp.maximum(anchors_flat, 0)], 0.0
    )
    grid = grid.at[setup.vert_vox].max(jnp.repeat(occ, 4))
    grid = grid.at[setup.cent_vox].max(occ)
    grid = grid.reshape(g, g, g)

    # One-voxel dilation (3^3 max-pool) before thresholding.
    def max3(x, axis):
        lo = jnp.concatenate(
            [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
             jax.lax.slice_in_dim(x, 0, g - 1, axis=axis)],
            axis=axis,
        )
        hi = jnp.concatenate(
            [jax.lax.slice_in_dim(x, 1, g, axis=axis),
             jax.lax.slice_in_dim(x, g - 1, g, axis=axis)],
            axis=axis,
        )
        return jnp.maximum(x, jnp.maximum(lo, hi))

    dilated = max3(max3(max3(grid, 0), 1), 2)
    occupied = dilated > skip_eps

    d = chebyshev_distance(occupied, max_skip_voxels)
    h_min = setup.meta[6]
    rho = jnp.maximum(d - 1.0, 0.0) * h_min

    out = jnp.zeros((g, g, g, 8), jnp.float32)
    out = out.at[..., 0].set(rho)
    out = out.at[..., 1].set(
        jax.lax.bitcast_convert_type(setup.loc_anchors, jnp.float32)
    )
    return out


def attach_skip_grid(mesh, skip_table: jnp.ndarray, meta: jnp.ndarray):
    """Mesh with the skip grid attached (read by ``march_features``)."""
    return dataclasses.replace(mesh, skip_table=skip_table, skip_meta=meta)
