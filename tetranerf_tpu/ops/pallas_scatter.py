"""Pallas TPU scatter-add: accumulate N feature rows into a [V, F] table.

The field gradient — the transpose of ``field[indices]`` — is the single
most expensive op of a train step under XLA, whose scatter-add lowers to
a serialized per-row update pipeline through HBM (measured 3-23 M rows/s
on v5e regardless of layout, with a ~300 ms floor at our sizes).

This kernel keeps a window of the output table RESIDENT IN VMEM across a
full pass over the input rows, so each row update is a VMEM-latency
read-modify-write instead of an HBM round trip. The output block spec
revisits the same window for all row chunks (TPU grid iterations run
sequentially on the core, so the block stays in VMEM and flushes once
per window).

Rows are processed serially within a chunk — TPU has no vector scatter —
but a VMEM RMW is ~10 cycles, not an HBM transaction. Cost model:
``N_rows x n_windows`` inner iterations; choose the window count so the
window fits VMEM (f32 [Wv, F<=128] tiles pad lanes to 128).

Used via :func:`gather_rows` — a custom-VJP ``table[indices]`` whose
backward is this kernel. Replaces the reference's CUDA atomicAdd
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
    window_rows: int = 32768,
    chunk: int = 2048,
    interpret: bool = False,
):
    """``zeros([num_rows, F]).at[indices].add(values)`` on the TPU core.

    ``indices i32[N]`` (out-of-range rows are DROPPED — callers encode
    invalid rows as -1), ``values f32[N, F]``. ``F`` must be <= 128.
    """
    n, feat = values.shape
    if n % chunk:
        pad = chunk - n % chunk
        indices = jnp.concatenate([indices, jnp.full((pad,), -1, jnp.int32)])
        values = jnp.concatenate([values, jnp.zeros((pad, feat), values.dtype)])
        n += pad
    n_windows = -(-num_rows // window_rows)
    grid = (n_windows, n // chunk)
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, window_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk,), lambda w, c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (chunk, feat), lambda w, c: (c, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (window_rows, feat), lambda w, c: (w, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_windows * window_rows, feat), jnp.float32
        ),
        interpret=interpret,
    )(indices.astype(jnp.int32), values.astype(jnp.float32))
    return out[:num_rows]


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
