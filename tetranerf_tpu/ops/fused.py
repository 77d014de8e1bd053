"""Fused traversal + field interpolation — the training hot path.

Motivation (measured on TPU v5e): random-row gathers run at only
~10-20M rows/s through XLA *or* naive per-row Pallas DMA — they are
row-rate-bound, not bandwidth-bound. The hot path must therefore gather as
few rows as possible and keep everything else dense:

1. The march reads ONE packed geometry row per (ray, step) —
   ``TetrahedraMesh.march_table[C, 24]`` holds planes (16 f32), neighbor
   ids and vertex ids (8 i32 bit-cast) — plus the 4 vertex feature rows of
   the current cell.
2. It emits the interpolated feature vector at each interval *exit point*.
   Barycentric interpolation is affine along the ray inside a cell and
   continuous across shared faces, so the feature at any sample is an
   exact linear interpolation of the two interval-endpoint features.
3. Per-sample features then come from a *dense* lerp over the emitted
   ``[R, T+1, F]`` buffer — a structured two-nonzero matmul on the MXU (or
   a batched take-along-axis) with zero random gathers.

This replaces the reference's ``find_visited_cells`` +
``interpolate_values`` round trips (``tetranerf/nerfstudio/model.py:
560-573``, ``src/tetrahedra_tracer.cu:115-221``) with an equivalent but
gather-minimal computation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.mesh import TetrahedraMesh
from .pallas_interp import stream_blend
from .traversal import _eval_planes, hull_intersect


class MarchStream(NamedTuple):
    """Geometry needed to (re)compute endpoint features for a march.

    Lets a cached march be re-shaded as the field trains (viewer /
    static-camera rendering): ``endpoint_features(field, stream)`` is
    the only field-dependent part of the traversal.
    """

    vids: jnp.ndarray  # i32[R, T+4] per-ray deduplicated vertex ids
    pos: jnp.ndarray  # i32[R, T+1, 4] endpoint -> stream positions
    bary: jnp.ndarray  # f32[R, T+1, 4] endpoint barycentric weights


class FusedMarch(NamedTuple):
    """Uncompacted traversal intervals with interval-endpoint features.

    Interval ``k`` of ray ``r`` spans ``[t0[r,k], t1[r,k]]`` where
    ``t0[:, 0] = t_entry`` and ``t0[:, k] = t1[:, k-1]``. Invalid slots
    have ``valid=False`` and ``t1=+inf``. ``feats[:, 0]`` is the feature at
    the chord entry point; ``feats[:, k+1]`` is the feature at the exit of
    interval ``k``.
    """

    cells: jnp.ndarray  # i32[R, T]
    t1: jnp.ndarray  # f32[R, T] exit distances (inf padded)
    t_entry: jnp.ndarray  # f32[R]
    valid: jnp.ndarray  # bool[R, T]
    num_valid: jnp.ndarray  # i32[R]
    feats: Optional[jnp.ndarray]  # f32[R, T+1, F] endpoint features
    hit: jnp.ndarray  # bool[R]
    overflow: jnp.ndarray  # bool[R] — step bound hit while still marching
    stream: Optional[MarchStream] = None
    t0s: Optional[jnp.ndarray] = None  # f32[R, T] explicit entry distances

    @property
    def t0(self):
        # The march records each interval's entry distance explicitly
        # (bit-identical to the derived chain for a contiguous march,
        # and the only correct value once empty-space re-skips
        # introduce gaps between consecutive intervals).
        if self.t0s is not None:
            return self.t0s
        return jnp.concatenate(
            [self.t_entry[:, None], self.t1[:, :-1]], axis=1
        )


def _walk_packed(table, cell, points, num_steps: int):
    """Point-location walk over packed march rows (same logic as
    ``traversal._walk``, but reading ``march_table`` so the fused path
    never touches the unpacked ``planes``/``neighbors`` arrays — they
    can be dropped from device memory, ``TetrahedraMesh.slim``)."""
    from .traversal import _BARY_EPS

    def body(_, state):
        c, done = state
        planes_c, neighbors, _ = _unpack_row(table[jnp.maximum(c, 0)])
        b = _eval_planes(planes_c, points)
        # b[argmin] is just min(b); the neighbor select is a 4-wide
        # one-hot compare-sum — take_along_axis here lowers to a
        # per-element gather row (~100M rows/s on TPU, as expensive as
        # the 64-f32 row fetch itself).
        inside = jnp.min(b, axis=-1) >= -_BARY_EPS
        k = jnp.argmin(b, axis=-1)
        oh = (
            jnp.arange(4, dtype=jnp.int32)[None, :] == k[..., None]
        )
        nxt = jnp.sum(jnp.where(oh, neighbors, 0), axis=-1)
        new_c = jnp.where(done | inside, c, nxt)
        new_done = done | inside | (nxt < 0)
        return new_c, new_done

    done0 = cell < 0
    cell, _ = jax.lax.fori_loop(0, num_steps, body, (cell, done0))
    return cell


def _unpack_row(row):
    """Split a packed (possibly padded) traversal row into its fields."""
    planes = row[..., :16].reshape(*row.shape[:-1], 4, 4)
    neighbors = jax.lax.bitcast_convert_type(row[..., 16:20], jnp.int32)
    vertex_ids = jax.lax.bitcast_convert_type(row[..., 20:24], jnp.int32)
    return planes, neighbors, vertex_ids


def march_features(
    mesh: TetrahedraMesh,
    field: Optional[jnp.ndarray],
    origins,
    directions,
    max_steps: int = 512,
    entry_walk_steps: int = 16,
    hops: int = 1,
    use_occupancy: bool = False,
    occ_threshold: float = 1e-3,
    compact_stages: int = 0,
    use_skip: bool = True,
    grad_stream_budget: Optional[int] = None,
    occ_depth_cap=None,
    stream_dtype: Optional[str] = None,
    compact_ratio: float = 0.5,
) -> FusedMarch:
    """March rays, emitting sorted intervals and endpoint features.

    ``field`` is ``f32[V, F]`` (or None to skip feature emission).
    Geometry logic matches :func:`tetranerf_tpu.ops.traversal.march` (same
    slab + walk entry, same locally-conditioned crossing computation).

    ``hops=2`` uses the two-hop packed table (``mesh.march_table2``): TPU
    gather throughput is limited by row *count* (128-float rows gather
    at the same ~100M rows/s row rate as 64-float rows, r5 width sweep),
    so fetching a cell's row together with its 4 neighbors' blocks
    advances TWO cells per sequential gather — halving the row count of
    the march's dominant gather chain. Occupancy termination, stream
    dedup, compaction, and the early-exit cascade all apply identically
    (the two-hop step runs the same per-hop body twice per fetched row);
    outputs are bit-identical to ``hops=1``. ``hops=1`` fetches one
    64-float row per step and needs no extra table.

    ``use_occupancy`` terminates a ray once its estimated
    transmittance ``exp(-sum sigma[cell] * dt)`` over crossed cells
    drops below ``occ_threshold`` — everything behind is occluded. The
    per-cell density estimate ``sigma`` rides in the packed march row
    (column 24), and ``dt`` is the ray's EXACT chord through the cell,
    so the accumulated optical depth is the true transmittance under
    piecewise-constant density: grazing rays (tiny ``dt``) keep
    marching, radial rays terminate right behind an opaque surface. The
    check is free (the row is already fetched); rays stop contributing
    march work once every ray in the batch is done (the chunked
    while_loop exit). Zero density (the initial state) never terminates,
    so training before the first occupancy update is exact.

    ``compact_stages`` enables per-ray compaction: each
    time at most ``compact_ratio`` of the current width remains active,
    the active rays are packed into a dense prefix and the march
    continues at the narrower width, so total gather work tracks the
    per-ray step distribution instead of the batch max. The result is
    bit-identical to the uncompacted march (stages carry full row
    history and are scattered back) for ANY schedule. This is what
    converts occupancy/early termination into wall-clock on a SIMD
    machine. ``compact_ratio`` trades staircase overhead (the march
    pays ``width`` while only ``active`` rays live) against stage count
    — each stage is one more while_loop in the executable; widths are
    rounded to multiples of 128 for tiling.

    ``use_skip`` (with ``use_occupancy`` and a mesh carrying a
    ``skip_table``, see :mod:`tetranerf_tpu.ops.skip_grid`) sphere-traces
    each ray from its hull entry through the free-space distance grid
    before marching: the march then starts at the first cell within one
    voxel of estimated density, and rays whose trace exits the hull
    (miss rays) never march at all. The skipped empty prefix emits no
    intervals — its estimated density is below the grid's ``skip_eps``,
    so the forfeited optical depth is negligible by construction (the
    OptiX BVH gives the reference the same culling for free,
    ``src/tetrahedra_tracer.cpp:285-332``).
    """
    mesh = mesh.on_device()
    origins = jnp.asarray(origins)
    directions = jnp.asarray(directions)
    num_rays = origins.shape[0]

    t_in, t_out, entry_facet, hit = hull_intersect(mesh, origins, directions)
    span = jnp.maximum(t_out - t_in, 1e-30)
    eps_t = 1e-3 * span + 1e-7
    t_cap = t_out + eps_t
    t_loc = t_in + eps_t
    seed = jnp.where(hit, mesh.hull_cells[entry_facet], -1)
    skipping = (
        use_skip
        and use_occupancy
        and mesh.skip_table.size > 0  # static: shapes are trace-time
    )
    if skipping:
        st = mesh.skip_table
        lo = mesh.skip_meta[:3]
        inv_h = mesh.skip_meta[3:6]
        gmax = jnp.asarray(
            [st.shape[0] - 1, st.shape[1] - 1, st.shape[2] - 1], jnp.int32
        )

        def vox_row(t):
            p = origins + t[:, None] * directions
            ij = jnp.clip(
                ((p - lo[None]) * inv_h[None]).astype(jnp.int32), 0, gmax
            )
            return st[ij[:, 0], ij[:, 1], ij[:, 2]]

        def s_cond(carry):
            _, moving, it = carry
            return jnp.any(moving) & (it < 64)

        def s_body(carry):
            t, moving, it = carry
            rho = vox_row(t)[:, 0]
            adv = moving & (rho > 0.0)
            t = jnp.where(adv, t + rho, t)
            return t, adv & (t < t_cap), it + 1

        t_loc, _, _ = jax.lax.while_loop(
            s_cond, s_body, (t_loc, hit, jnp.int32(0))
        )
        # Rays whose trace left the hull crossed only free space: done.
        hit = hit & (t_loc < t_cap)
        row_s = vox_row(jnp.minimum(t_loc, t_cap))
        anchor = jax.lax.bitcast_convert_type(row_s[:, 1], jnp.int32)
        skipped = t_loc > t_in + eps_t
        seed = jnp.where(
            ~hit, -1, jnp.where(skipped & (anchor >= 0), anchor, seed)
        )
    p_entry = origins + t_loc[:, None] * directions
    entry_cell = _walk_packed(
        mesh.march_table, seed, p_entry, entry_walk_steps
    )
    hit = hit & (entry_cell >= 0)

    def crossings(row, t, o, d):
        """Face-crossing distances from position t given a packed row."""
        planes_c, neighbors, vertex_ids = _unpack_row(row)
        p = o + t[:, None] * d
        b = _eval_planes(planes_c, p)
        den = jnp.sum(planes_c[..., :3] * d[:, None, :], axis=-1)
        t_cross = t[:, None] - b / jnp.where(den == 0.0, jnp.inf, den)
        return b, den, t_cross, neighbors, vertex_ids

    def exit_face(b, den, t_cross, t):
        t_k = jnp.where(den < 0.0, t_cross, jnp.inf)
        k_exit = jnp.argmin(t_k, axis=-1)
        t_exit_raw = jnp.min(t_k, axis=-1)
        found = jnp.isfinite(t_exit_raw)
        t_exit = jnp.maximum(t_exit_raw, t)  # monotonic despite roundoff
        bary_exit = b + (t_exit - t)[:, None] * den  # affine along the ray
        return k_exit, t_exit, found, bary_exit

    c0_safe = jnp.maximum(entry_cell, 0)
    row0 = mesh.march_table[c0_safe]
    b0, den0, t_cross0, _, vids0 = crossings(
        row0, t_loc, origins, directions
    )
    t_entry = jnp.max(jnp.where(den0 > 0.0, t_cross0, -jnp.inf), axis=-1)
    t_entry = jnp.where(jnp.isfinite(t_entry), t_entry, t_loc)

    bary_entry = b0 + (t_entry - t_loc)[:, None] * den0

    def hop(c, t, done, row, o, d, cap):
        """One marching hop given the cell's packed 24-float row."""
        b, den, t_cross, neighbors, vertex_ids = crossings(row, t, o, d)
        k_exit, t_exit, found, bary_exit = exit_face(b, den, t_cross, t)
        # One-hot compare-sum, NOT take_along_axis: XLA lowers the
        # latter to one gather row per ray per step (~100M rows/s),
        # which measured as expensive as the march-row fetch itself
        # (11.3 vs 11.5 ms/step at 8K rays on v5e).
        oh = jnp.arange(4, dtype=jnp.int32)[None, :] == k_exit[:, None]
        nxt = jnp.sum(jnp.where(oh, neighbors, 0), axis=-1)
        valid = ~done & found & (c >= 0)
        new_done = done | ~found | (nxt < 0) | (t_exit >= cap)
        emit_cell = jnp.where(valid, c, -1)
        emit_t = jnp.where(valid, t_exit, jnp.inf)
        new_c = jnp.where(valid, nxt, c)
        new_t = jnp.where(valid, t_exit, t)
        return (new_c, new_t, new_done), (
            emit_cell,
            emit_t,
            k_exit,
            valid,
            bary_exit,
            vertex_ids,
        )

    table = mesh.march_table
    if hops == 2:
        # Two-hop rows: 128-float rows gather at the SAME ~100M
        # rows/s row rate as 64-float rows (r5 width sweep), so one
        # fetch advances TWO cells — halving the march's sequential
        # gather-chain row count. Everything else (occupancy
        # termination, per-ray stream dedup, compaction cascade,
        # early exit) is identical to hops=1: the two-hop step just
        # runs the same per-hop body twice per fetched row, with the
        # second hop's 25-float block selected from the row by the
        # first hop's exit face (a 4-way VPU one-hot, not a gather).
        table2 = mesh.march_table2
        if table2.shape[0] == 0:
            raise ValueError(
                "hops=2 requires build_mesh(two_hop_table=True)"
            )

    # ``occ_depth_cap`` may be a TRACED scalar (the trainer
    # re-calibrates it against the model's true optical depth every
    # retune — see ``Trainer.retune_with_transmittance`` — and a
    # traced cap changes without recompiling the step).
    if not use_occupancy:
        depth_cap = 0.0
    elif occ_depth_cap is not None:
        depth_cap = occ_depth_cap
    else:
        depth_cap = -float(np.log(occ_threshold))

    def substep(state, row, step_idx, consts):
        """One marching hop given the cell's packed (>=25-float) row:
        face crossing + occupancy depth + per-ray stream dedup +
        gated emission. Shared verbatim by the 1- and 2-hop steps."""
        o, d, cap = consts
        c, t, done, vids_prev, pos_prev, depth = state
        (new_c, new_t, new_done), e = hop(c, t, done, row, o, d, cap)
        if use_occupancy:
            # Exact optical depth through the crossed cell (sigma
            # estimate x the ray's chord through it); the cell
            # itself is still emitted, later cells are occluded.
            sigma = row[..., 24]
            depth = depth + jnp.where(e[3], sigma * (new_t - t), 0.0)
            new_done = new_done | (depth > depth_cap)
        vids_cur = e[5]  # [R, 4] current cell's vertex ids
        # Per-ray vertex-stream dedup: a face-adjacent step shares 3
        # of 4 vertices with the previous cell, so each step
        # introduces at most ONE new vertex. Track each current
        # vertex's position in the ray's stream of first appearances;
        # downstream, features are gathered once per unique
        # (ray, vertex) instead of 4x per endpoint.
        eq = vids_cur[:, :, None] == vids_prev[:, None, :]  # [R, 4c, 4p]
        is_new = ~jnp.any(eq, axis=-1)
        matched_pos = jnp.sum(
            eq * pos_prev[:, None, :], axis=-1
        ).astype(jnp.int32)
        pos_cur = jnp.where(is_new, jnp.int32(4) + step_idx, matched_pos)
        new_vid = jnp.sum(
            jnp.where(is_new, vids_cur, 0), axis=-1
        ).astype(jnp.int32)
        # Gate emissions by ``valid`` so the buffers match their
        # initial padding on post-done steps. This makes the output
        # independent of when the surrounding while_loop exits
        # (which depends on OTHER rays' step counts) — required for
        # the compaction cascade to be bit-identical, and makes the
        # march deterministic w.r.t. batch composition in general.
        active = e[3]
        emit = (
            e[0],
            e[1],
            jnp.where(active[:, None], e[4], 0.0),
            jnp.where(active[:, None], pos_cur, 0),
            jnp.where(active, new_vid, 0),
            # Explicit entry distance: equals the previous exit for
            # a contiguous march (``t`` is the carried exit), and
            # stays exact once re-skips introduce gaps.
            jnp.where(active, t, jnp.inf),
        )
        state = (new_c, new_t, new_done, vids_cur, pos_cur, depth)
        return state, emit, e[2]

    if hops == 2:

        def step(carry, i):
            consts, state = carry
            width = state[0].shape[0]
            row2 = table2[jnp.maximum(state[0], 0)][:, :125].reshape(
                width, 5, 25
            )
            state, emitA, k1 = substep(state, row2[:, 0], 2 * i, consts)
            # Second hop's block selected by the first hop's exit
            # face — a 4-way one-hot compare-sum over the already-
            # fetched row, NOT a gather (see the hop() comment).
            # The select runs in INTEGER bit-space: the row's
            # neighbor/vertex-id columns are bit-cast int32s whose
            # float values are denormals (ids < 2^23), and float
            # arithmetic flushes denormals to zero — an f32 one-hot
            # sum silently rewrites every small cell id to 0.
            oh = jnp.arange(4, dtype=jnp.int32)[None, :] == k1[:, None]
            bits = jax.lax.bitcast_convert_type(row2[:, 1:], jnp.int32)
            rowB = jax.lax.bitcast_convert_type(
                jnp.sum(jnp.where(oh[:, :, None], bits, 0), axis=1),
                jnp.float32,
            )
            state, emitB, _ = substep(state, rowB, 2 * i + 1, consts)
            # [2, W, ...] — step-major pairs land contiguously.
            emit = tuple(
                jnp.stack(ab, axis=0) for ab in zip(emitA, emitB)
            )
            return (consts, state), emit

    else:

        def step(carry, i):
            consts, state = carry
            row = table[jnp.maximum(state[0], 0)]
            state, emit, _ = substep(state, row, i, consts)
            return (consts, state), emit

    pos0 = jnp.broadcast_to(
        jnp.arange(4, dtype=jnp.int32)[None, :], (num_rays, 4)
    )
    state = (
        entry_cell,
        t_entry,
        ~hit,
        vids0,
        pos0,
        jnp.zeros(num_rays, jnp.float32),  # accumulated optical depth
    )
    consts = (origins, directions, t_cap)

    # Early-exit march: a while_loop over CHUNK-step scan blocks that
    # stops once EVERY ray is done, so the sequential-gather chain
    # tracks the batch's actual max crossing count instead of the
    # worst-case bound (the bound is a safety cap, often 1.5-2x the
    # batch max after tuning; for eval/render it defaults to 512).
    # Untouched buffer tails keep the exact padding the scan would
    # have emitted (cells=-1, t=inf, bary/pos/vid=0).
    chunk = min(16, -(-max_steps // hops))
    n_chunks = -(-max_steps // (chunk * hops))
    total = n_chunks * chunk * hops

    def body(carry):
        i, consts, state, bufs = carry
        xs = i * chunk + jnp.arange(chunk, dtype=jnp.int32)
        (consts, state), outs = jax.lax.scan(step, (consts, state), xs)
        # Buffers are STEP-major ([total, W, ...]): the scan's
        # [chunk(, hops), W, ...] block lands with one contiguous
        # dynamic_update_slice and NO per-chunk transpose — the
        # [chunk, W] -> [W, chunk] relayouts cost ~1.4 ms/step at
        # [8K, 256] (4 Mosaic sublane/lane swaps per chunk, traced);
        # one big [total, W] -> [W, total] transpose per march pays
        # the same bytes at full-tile efficiency instead.
        start = i * chunk * hops
        if hops == 2:  # [chunk, 2, W, ...] -> [chunk*2, W, ...]
            outs = tuple(
                o.reshape(chunk * 2, *o.shape[2:]) for o in outs
            )
        bufs = tuple(
            jax.lax.dynamic_update_slice(
                buf,
                o.astype(buf.dtype),
                (start,) + (0,) * (buf.ndim - 1),
            )
            for buf, o in zip(bufs, outs)
        )
        return i + 1, consts, state, bufs

    # Per-ray compaction cascade: the march cost is the sequential
    # row-gather chain, width x steps rows. A batch-synchronized loop
    # pays the batch MAX step count for every ray; here, once at most
    # half the rays are still marching, the active rays are permuted
    # into a dense prefix and the march continues at half width
    # (repeat ``compact_stages`` times). Output rows carry their full
    # history (each stage's buffers start as a row-gather of the
    # parent's), so a final row-scatter per stage reassembles the
    # exact uncompacted result. Rays dropped while still active
    # (budget exhausted mid-cascade) keep done=False and surface in
    # ``overflow``.
    widths = [num_rays]
    while len(widths) - 1 < compact_stages:
        nxt = int(widths[-1] * compact_ratio)
        nxt = max(nxt // 128 * 128, max(chunk, 64))
        if nxt >= widths[-1]:
            break
        widths.append(nxt)
    n_stages = len(widths) - 1

    bufs = (
        jnp.full((total, num_rays), -1, jnp.int32),  # cells
        jnp.full((total, num_rays), jnp.inf, jnp.float32),  # t1
        jnp.zeros((total, num_rays, 4), jnp.float32),  # bary_exit
        jnp.zeros((total, num_rays, 4), jnp.int32),  # stream pos
        jnp.zeros((total, num_rays), jnp.int32),  # new vertex id
        jnp.full((total, num_rays), jnp.inf, jnp.float32),  # t0
    )
    final_bufs = bufs
    perm = jnp.arange(num_rays, dtype=jnp.int32)
    done_full = state[2]
    i = jnp.int32(0)
    for s in range(n_stages + 1):
        if s == n_stages:

            def cond(carry):
                i, _, st, _ = carry
                return (i < n_chunks) & ~jnp.all(st[2])

        else:
            nxt = widths[s + 1]

            def cond(carry, nxt=nxt):
                i, _, st, _ = carry
                active = jnp.sum(~st[2])
                return (i < n_chunks) & (active > nxt)

        i, consts, state, bufs = jax.lax.while_loop(
            cond, body, (i, consts, state, bufs)
        )
        if s == 0:
            final_bufs = bufs
            done_full = state[2]
        else:
            final_bufs = tuple(
                fb.at[:, perm].set(b) for fb, b in zip(final_bufs, bufs)
            )
            done_full = done_full.at[perm].set(state[2])
        if s < n_stages:
            nxt = widths[s + 1]
            order = jnp.argsort(state[2].astype(jnp.int32), stable=True)
            take = order[:nxt]
            perm = perm[take]
            consts = tuple(a[take] for a in consts)
            state = tuple(a[take] for a in state)
            bufs = tuple(b[:, take] for b in bufs)

    done_final = done_full
    # One ray-major relayout per buffer (see the body() comment).
    cells, t1s, barys, poss, new_vids, t0s = (
        jnp.moveaxis(b[:max_steps], 0, 1) for b in final_bufs
    )

    # Geometry is not differentiated (the reference likewise optimizes the
    # field only); stopping gradients here keeps autodiff from replaying
    # the sequential scan in the backward pass.
    cells, t1s, barys, t_entry = jax.lax.stop_gradient(
        (cells, t1s, barys, t_entry)
    )
    if t0s is not None:
        t0s = jax.lax.stop_gradient(t0s)
    valid = cells >= 0
    num_valid = jnp.sum(valid, axis=-1).astype(jnp.int32)
    hit = hit & (num_valid > 0)
    # Truncation detector (the reference's cap silently drops far geometry,
    # ``py_binding.cpp:44-47`` + ``optix_trace_rays.cu:312-315``; here the
    # condition is surfaced so callers can alarm/retune).
    overflow = jax.lax.stop_gradient(hit & ~done_final)

    all_bary = jnp.concatenate([bary_entry[:, None], barys], axis=1)
    all_valid = jnp.concatenate([hit[:, None], valid], axis=1)
    all_bary = jax.lax.stop_gradient(
        jnp.where(all_valid[..., None], all_bary, 0.0)
    )
    feats = None
    stream = MarchStream(
        *jax.lax.stop_gradient(
            (
                jnp.concatenate([vids0, new_vids], axis=1),
                jnp.concatenate([pos0[:, None, :], poss], axis=1),
            )
        ),
        bary=all_bary,
    )
    if field is not None:
        feats = endpoint_features(
            field,
            stream,
            counts=num_valid + 4,
            grad_budget=grad_stream_budget,
            stream_dtype=stream_dtype,
        )
    return FusedMarch(
        cells=cells,
        t1=t1s,
        t_entry=t_entry,
        valid=valid,
        num_valid=num_valid,
        feats=feats,
        hit=hit,
        overflow=overflow,
        stream=stream,
        t0s=t0s,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _stream_gather(field, vids, counts, grad_budget: int):
    """``field[vids]`` whose VJP scatters only the VALID-PREFIX rows.

    The stream is ragged: ray ``r`` uses its first ``counts[r]`` slots,
    the rest are zero-bary padding whose gradient rows are exactly zero
    — yet XLA's scatter-add pays per ROW, so the dense transpose
    scatters R*(T+4) rows (the largest single op of the backward,
    ~29 ms at [8K, 260] into [100K, 64]). Here the backward packs each
    ray's valid prefix into a flat [grad_budget] layout (offsets by
    cumsum; slot->ray recovered with a 1-per-ray scatter + cumsum — no
    per-slot searchsorted) and scatters only those rows. If a batch's
    total valid rows exceed ``grad_budget``, the overshoot rays' field
    gradient is dropped for that step — callers surface the condition
    via the ``grad_stream_overflow`` metric (sized from the same
    ``counts``) so it is visible, and the budget has ~2x headroom over
    the sum's tight concentration (sigma/mean ~ 1/sqrt(R))."""
    return field[jnp.maximum(vids, 0)]


def _stream_gather_fwd(field, vids, counts, grad_budget):
    return _stream_gather(field, vids, counts, grad_budget), (
        vids,
        counts,
        field.shape[0],
    )


def _stream_gather_bwd(grad_budget, residuals, g):
    vids, counts, num_vertices = residuals
    num_rays, width = vids.shape
    f = g.shape[-1]
    counts = jnp.minimum(counts, width)
    ends = jnp.cumsum(counts)
    offs = ends - counts  # exclusive prefix sum
    # slot j -> ray r: one scatter-increment per ray boundary, then a
    # cumsum. Rays starting at/after the budget pile marks into the
    # last slot; the (u < counts) guard below zeroes those slots.
    j = jnp.arange(grad_budget, dtype=jnp.int32)
    mark = jnp.zeros(grad_budget, jnp.int32)
    mark = mark.at[jnp.minimum(offs, grad_budget - 1)].add(
        jnp.where(counts > 0, 1, 0)
    )
    r_of_j = jnp.cumsum(mark) - 1
    r_c = jnp.clip(r_of_j, 0, num_rays - 1)
    u = j - offs[r_c]
    ok = (r_of_j >= 0) & (u >= 0) & (u < counts[r_c])
    src = jnp.where(ok, r_c * width + jnp.maximum(u, 0), 0)
    rows = jnp.where(
        ok[:, None], g.reshape(num_rays * width, f)[src], 0.0
    )
    scat_vids = jnp.where(
        ok, jnp.maximum(vids.reshape(-1)[src], 0), 0
    )
    grad_field = (
        jnp.zeros((num_vertices, f), g.dtype).at[scat_vids].add(rows)
    )
    return grad_field, None, None


_stream_gather.defvjp(_stream_gather_fwd, _stream_gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows_lowp(field, vids, dtype_name: str = "bfloat16"):
    """``field.astype(dtype)[vids]`` whose VJP keeps the [V, F] field-
    gradient ACCUMULATION in f32.

    Both random-row walls of the stream path move half the bytes: the
    forward gathers low-precision rows (one [V, F] cast per step, ~13 MB
    at bench shapes — amortized over the ~1M-row gather), and the
    backward's scatter-add reads low-precision gradient rows (the blend
    kernel emits the cotangent in the primal's dtype, ``pallas_interp.
    _blend_bwd``) while the convert into the f32 target fuses into the
    scatter. A plain ``field.astype(bf16)[vids]`` under autodiff would
    instead accumulate the scatter in bf16 — ~10-200 rows sum into each
    vertex row, which bf16's 8 mantissa bits cannot carry."""
    return field.astype(jnp.dtype(dtype_name))[jnp.maximum(vids, 0)]


def _gather_rows_lowp_fwd(field, vids, dtype_name):
    return gather_rows_lowp(field, vids, dtype_name), (vids, field.shape)


def _gather_rows_lowp_bwd(dtype_name, residuals, g):
    vids, shape = residuals
    grad_field = (
        jnp.zeros(shape, jnp.float32)
        .at[jnp.maximum(vids, 0)]
        .add(g.astype(jnp.float32))
    )
    return grad_field, None


gather_rows_lowp.defvjp(_gather_rows_lowp_fwd, _gather_rows_lowp_bwd)


def endpoint_features(
    field,
    stream: MarchStream,
    counts=None,
    grad_budget: Optional[int] = None,
    stream_dtype: Optional[str] = None,
):
    """Interval-endpoint features from a march's vertex stream.

    ONE feature row per unique (ray, vertex) — a 4x smaller gather than
    per-endpoint vertex gathers, and a 4x smaller scatter in the
    backward (the dominant cost of a train step on TPU). The only
    field-dependent piece of the traversal: re-run it against an updated
    field to re-shade a cached march (static-camera rendering during
    training).

    With ``counts`` (per-ray valid stream lengths, ``num_valid + 4``)
    and ``grad_budget`` (static total row budget), the backward scatter
    is compacted to the valid prefix rows only (see
    :func:`_stream_gather`). With ``stream_dtype`` (e.g. ``"bfloat16"``,
    ``config.field_stream_dtype``) the stream rows move at low precision
    in both directions while the field gradient still accumulates in f32
    (:func:`gather_rows_lowp`); mutually exclusive with ``grad_budget``."""
    if grad_budget is not None and counts is not None:
        stream_field = _stream_gather(
            field,
            stream.vids,
            jax.lax.stop_gradient(counts),
            int(grad_budget),
        )
    elif stream_dtype is not None and jnp.dtype(stream_dtype) != jnp.dtype(
        field.dtype
    ):
        stream_field = gather_rows_lowp(field, stream.vids, str(stream_dtype))
    else:
        stream_field = field[jnp.maximum(stream.vids, 0)]  # [R, T+4, F]
    return stream_blend(stream_field, stream.pos, stream.bary)


def _slice_march(res: FusedMarch, idx, t: int) -> FusedMarch:
    """Row-subset + interval-prefix view of a march (``feats`` dropped —
    recompute per slice via :func:`endpoint_features`).

    Slicing the interval axis to ``t`` keeps every stream position an
    endpoint can reference (positions are bounded by ``4 + k`` at
    endpoint ``k``), so a sliced stream is self-consistent. Rays with
    more than ``t`` valid intervals lose their far tail; that truncation
    is folded into ``overflow`` — reported, never silent."""
    t = min(t, res.t1.shape[1])
    s = res.stream
    stream = (
        MarchStream(
            vids=s.vids[idx][:, : t + 4],
            pos=s.pos[idx][:, : t + 1],
            bary=s.bary[idx][:, : t + 1],
        )
        if s is not None
        else None
    )
    valid = res.valid[idx][:, :t]
    num_valid = jnp.sum(valid, axis=-1).astype(jnp.int32)
    return FusedMarch(
        cells=res.cells[idx][:, :t],
        t1=res.t1[idx][:, :t],
        t_entry=res.t_entry[idx],
        valid=valid,
        num_valid=num_valid,
        feats=None,
        hit=res.hit[idx],
        overflow=res.overflow[idx] | (num_valid < res.num_valid[idx]),
        stream=stream,
        t0s=res.t0s[idx][:, :t] if res.t0s is not None else None,
    )


def ray_bounds(res: FusedMarch, near: float = 0.0):
    """Per-ray ``(nears, fars, first_kept, num_kept, ray_mask)``.

    Intervals whose entry lies before ``near`` are excluded, matching the
    reference semantics where the partial cell containing an inside-hull
    ray origin is never reported (``optix_trace_rays.cu:110-266``).
    """
    t0 = res.t0
    drop = jnp.sum(res.valid & (t0 < near), axis=-1).astype(jnp.int32)
    num_kept = res.num_valid - drop
    ray_mask = res.hit & (num_kept > 0)
    max_t = res.t1.shape[1]
    first = jnp.minimum(drop, max_t - 1)[:, None]
    nears = jnp.take_along_axis(t0, first, axis=1)[:, 0]
    last = jnp.clip(res.num_valid - 1, 0, max_t - 1)[:, None]
    fars = jnp.take_along_axis(res.t1, last, axis=1)[:, 0]
    nears = jnp.where(ray_mask, nears, 0.0)
    fars = jnp.where(ray_mask, jnp.maximum(fars, nears + 1e-6), 1.0)
    return nears, fars, drop, num_kept, ray_mask


def biased_warp_range(res: FusedMarch, first, num_kept, nears, fars, samples):
    """Interval-biased warp over a contiguous *range* of valid intervals.

    Same math as :func:`tetranerf_tpu.ops.sampling.biased_warp`
    (reference ``model.py:111-122``) but operating on the uncompacted
    interval layout: intervals ``first..first+num_kept-1`` each receive an
    equal share of the sample budget.
    """
    max_t = res.t1.shape[1]
    idx_t = jnp.arange(max_t)[None, :]
    kept = (idx_t >= first[:, None]) & (idx_t < (first + num_kept)[:, None])
    t0 = res.t0
    lengths = jnp.where(kept, jnp.maximum(res.t1 - t0, 0.0), 0.0)
    span = fars - nears
    uni = (samples - nears[:, None]) / jnp.where(span == 0, 1.0, span)[:, None]
    nk = jnp.maximum(num_kept, 1)[:, None]
    rest = uni * nk
    local = jnp.clip(jnp.floor(rest), 0.0, nk - 1)
    rest = rest - local
    intervals = first[:, None] + local.astype(jnp.int32)
    intervals = jnp.clip(intervals, 0, max_t - 1)
    cum = jnp.cumsum(
        jnp.concatenate([nears[:, None], lengths], axis=1), axis=1
    )
    # Gather-free lookup: scalar take_along_axis gathers here cost
    # ~10ms/step at [8K, 128]. ``cum`` is a nondecreasing cumsum, so
    # ``cum[intervals]`` is a masked max-reduction (exact element
    # selection — max of a sorted prefix); ``lengths[intervals]`` is not
    # sorted, so it is selected with an exact one-hot sum (NOT
    # ``cum[k+1]-cum[k]``, whose cancellation error moves samples by
    # ~ulp(cum)/length relative).
    idx = intervals[:, :, None]
    slots1 = jnp.arange(max_t + 1, dtype=jnp.int32)[None, None, :]
    cum_at = jnp.max(
        jnp.where(slots1 <= idx, cum[:, None, :], -jnp.inf), axis=-1
    )
    slots0 = jnp.arange(max_t, dtype=jnp.int32)[None, None, :]
    len_at = jnp.sum(
        jnp.where(slots0 == idx, lengths[:, None, :], 0.0), axis=-1
    )
    return cum_at + len_at * rest


def _interp_precision(dtype):
    # With f32 operands force full precision (TPU would otherwise
    # decompose the f32 matmul into bf16 MXU passes).
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


@jax.custom_vjp
def _interp_matmul(feats, w):
    """``out[r,s,f] = Σ_t w[r,s,t]·feats[r,t,f]`` with ``w`` pinned as the
    backward's residual.

    Plain autodiff of the dot would let XLA *recompute* the [R, S, T+1]
    one-hot in the backward (it is a cheap fusible broadcast-compare, so
    XLA prefers rebuild over a 1 GB materialization) — measured slower
    than re-reading it. The custom VJP makes ``w`` a real buffer crossing
    the fwd/bwd boundary: the backward is a single batched matmul.
    ``w`` takes no gradient (it is built from stop-gradiented geometry).
    """
    return jax.lax.dot_general(
        w,
        feats,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=_interp_precision(w.dtype),
    )


def _interp_matmul_fwd(feats, w):
    return _interp_matmul(feats, w), w


def _interp_matmul_bwd(w, g):
    gf = jax.lax.dot_general(
        w,
        g.astype(w.dtype),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=_interp_precision(w.dtype),
    )
    # ``w`` is built from stop-gradiented geometry, so its cotangent is
    # discarded upstream and XLA DCEs these zeros.
    return gf.astype(g.dtype), jnp.zeros_like(w)


_interp_matmul.defvjp(_interp_matmul_fwd, _interp_matmul_bwd)


def sample_features(
    res: FusedMarch,
    distances,
    ray_mask,
    use_matmul: str | bool = "pallas",
    compute_dtype=jnp.bfloat16,
):
    """Per-sample features + validity from dense interval-endpoint feats.

    ``distances f32[R, S]`` (sorted). Returns ``(features f32[R, S, F],
    mask bool[R, S])``. The sample's interval is found by a vectorized
    compare-sum (the two-pointer sweep of the reference's
    ``find_matched_cells_kernel``, ``src/tetrahedra_tracer.cu:132-159``,
    is equivalent to searchsorted); its feature is the exact lerp of the
    interval endpoint features.

    ``use_matmul``: ``"pallas"`` (default) runs the endpoint lerp as a
    Pallas kernel that builds the selection matrix in VMEM
    (:mod:`tetranerf_tpu.ops.pallas_interp`); ``True`` materializes the
    one-hot matmul in XLA; ``False`` uses take-along-axis gathers.
    """
    t1 = res.t1  # inf at invalid slots
    max_t = t1.shape[1]
    # Sample->interval matching without gathers: scalar take_along_axis
    # lowers to per-element gather rows (~50-100M rows/s on TPU — the
    # dominant cost of this function at [8K, 256]). ``t0``/``t1`` are
    # sorted along the interval axis, so the bracketing endpoint
    # distances are masked min-reductions over a fused broadcast, and
    # ``k`` (first interval with t1 > d) is a compare-sum.
    t0 = res.t0
    gt = t1[:, None, :] > distances[:, :, None]  # [R, S, T]
    k = max_t - jnp.sum(gt.astype(jnp.int32), axis=-1)
    k_c = jnp.minimum(k, max_t - 1)
    t0k = jnp.min(jnp.where(gt, t0[:, None, :], jnp.inf), axis=-1)
    t1k = jnp.min(jnp.where(gt, t1[:, None, :], jnp.inf), axis=-1)
    mask = (
        ray_mask[:, None]
        & (k < res.num_valid[:, None])
        & (distances >= t0k)
    )
    frac = (distances - t0k) / jnp.maximum(t1k - t0k, 1e-20)
    frac = jnp.clip(jnp.where(mask, frac, 0.0), 0.0, 1.0)

    feats = res.feats  # [R, T+1, F]
    if use_matmul == "pallas":
        from .pallas_interp import interp_endpoints

        out = interp_endpoints(feats, k_c, frac)
        out = jnp.where(mask[..., None], out, 0.0)
    elif use_matmul:
        # Two-nonzero structured matmul on the MXU: rows select endpoint
        # k (weight 1-frac) and k+1 (weight frac) of the feature buffer.
        # Build ``w`` directly in compute_dtype — the [R, S, T+1] one-hot
        # is the dominant HBM tensor of this path (1 GB in bf16 at bench
        # shapes, 4 GB in f32). Autodiff keeps it as the matmul residual,
        # so the backward (``w^T @ g``) re-rides the MXU with no rebuild —
        # unlike the Pallas kernel, whose bwd reconstructs ``w`` per ray.
        wf = jnp.where(mask, frac, 0.0).astype(compute_dtype)
        w0 = (
            jnp.where(mask, 1.0 - frac, 0.0).astype(compute_dtype)
        )
        slots = jnp.arange(max_t + 1, dtype=jnp.int32)[None, None, :]
        w = jnp.where(slots == k_c[..., None], w0[..., None], 0)
        w = w + jnp.where(slots == (k_c + 1)[..., None], wf[..., None], 0)
        out = _interp_matmul(feats.astype(compute_dtype), w)
    else:
        f0 = jnp.take_along_axis(feats, k_c[..., None], axis=1)
        f1 = jnp.take_along_axis(feats, (k_c + 1)[..., None], axis=1)
        out = (1.0 - frac)[..., None] * f0 + frac[..., None] * f1
        out = jnp.where(mask[..., None], out, 0.0)
    return out, mask
