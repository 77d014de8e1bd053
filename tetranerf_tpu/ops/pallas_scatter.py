"""Pallas TPU scatter-add: accumulate N feature rows into a [V, F] table.

EXPERIMENT — NOT USED BY THE MODEL. Verdict (v5e, correct one-element-
fetch timing, 2026-08): XLA's native scatter-add does 28-47 M rows/s at
our shapes ([0.5-2M rows, 64] into [100k, 64]) while this kernel peaks at
~13 M rows/s (w=16384, lane-packed) — the serial per-row VMEM RMW loop
can't beat XLA's pipelined HBM scatter, and every extra window multiplies
the full input pass. Earlier measurements suggesting XLA scatter ran at
3 M rows/s were an artifact of a timing harness that fetched the whole
output buffer through the device tunnel. Kept as documentation of the
attempt; the model's field gradient uses plain autodiff scatter-add.

Design, for the record: keep a window of the output table RESIDENT IN
VMEM across a full pass over the input rows (output block spec revisits
the same window for all row chunks; TPU grid iterations run sequentially
on the core, so the block stays in VMEM and flushes once per window),
and pack two 64-wide table rows per 128-lane VMEM row so the window
wastes no lanes. Rows are processed serially within a chunk — TPU has no
vector scatter.

:func:`gather_rows` wraps it as a custom-VJP ``table[indices]`` whose
backward is this kernel, mirroring the reference's CUDA atomicAdd
interpolation backward (``src/tetrahedra_tracer.cu:223-265``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(window_rows, idx_ref, val_ref, out_ref):
    w = pl.program_id(0)
    base = w * window_rows

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    chunk = val_ref.shape[0]

    def body(i, _):
        v = idx_ref[i] - base

        @pl.when((v >= 0) & (v < window_rows))
        def _():
            out_ref[pl.ds(v, 1), :] += val_ref[pl.ds(i, 1), :]

        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_rows", "window_rows", "chunk", "interpret"),
)
def scatter_add_rows(
    indices,
    values,
    num_rows: int,
    window_rows: int = 8192,
    chunk: int = 2048,
    interpret: bool = False,
):
    """``zeros([num_rows, F]).at[indices].add(values)`` on the TPU core.

    ``indices i32[N]`` (out-of-range rows are DROPPED — callers encode
    invalid rows as -1), ``values f32[N, F]`` with ``F <= 64``.

    Rows narrower than the 128-float VMEM lane tile would waste half the
    resident window, so pairs of table rows are packed into one 128-wide
    lane row (row ``2i`` in lanes [0, 64), row ``2i+1`` in [64, 128)) —
    ``window_rows`` counts PACKED rows, i.e. ``2*window_rows`` table rows
    per VMEM-resident window.
    """
    n, feat = values.shape
    if feat > 64:
        raise ValueError(f"F={feat} > 64 not supported by the packed layout")
    if n % chunk:
        pad = chunk - n % chunk
        indices = jnp.concatenate([indices, jnp.full((pad,), -1, jnp.int32)])
        values = jnp.concatenate([values, jnp.zeros((pad, feat), values.dtype)])
        n += pad
    indices = indices.astype(jnp.int32)
    values = values.astype(jnp.float32)
    if feat < 64:
        values = jnp.pad(values, ((0, 0), (0, 64 - feat)))
    # Pack: even target rows -> lanes [0, 64), odd -> [64, 128).
    odd = (indices & 1).astype(bool)[:, None]
    zeros = jnp.zeros_like(values)
    packed_vals = jnp.where(
        odd,
        jnp.concatenate([zeros, values], axis=1),
        jnp.concatenate([values, zeros], axis=1),
    )
    packed_idx = jnp.where(indices >= 0, indices >> 1, -1)
    half_rows = -(-num_rows // 2)
    n_windows = -(-half_rows // window_rows)
    grid = (n_windows, n // chunk)
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, window_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk,), lambda w, c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (chunk, 128), lambda w, c: (c, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (window_rows, 128), lambda w, c: (w, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_windows * window_rows, 128), jnp.float32
        ),
        interpret=interpret,
    )(packed_idx, packed_vals)
    return out.reshape(-1, 64)[:num_rows, :feat]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(table, indices, interpret=None):
    """``table[indices]`` whose backward runs :func:`scatter_add_rows`.

    ``table f32[V, F]``, ``indices i32[...]`` clipped to [0, V). The
    forward uses XLA's native gather (fast for wide rows); only the
    transpose needs the Pallas path.
    """
    return table[jnp.maximum(indices, 0)]


def _gather_fwd(table, indices, interpret):
    return gather_rows(table, indices, interpret), (
        indices,
        table.shape[0],
    )


def _gather_bwd(interpret, residuals, g):
    indices, num_rows = residuals
    interpret = not _on_tpu() if interpret is None else interpret
    feat = g.shape[-1]
    flat_idx = jnp.maximum(indices, 0).reshape(-1)
    flat_g = g.reshape(-1, feat)
    return (
        scatter_add_rows(flat_idx, flat_g, num_rows, interpret=interpret),
        None,
    )


gather_rows.defvjp(_gather_fwd, _gather_bwd)
