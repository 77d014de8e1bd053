"""Pallas row-gather kernel (experimental; measured on TPU v5e).

Random-row gathers are the framework's hot primitive (the marcher's table
fetches and the field interpolation). This kernel implements the obvious
Pallas design: per-row async DMA HBM→output block, double-buffered.

**Measured verdict on v5e:** XLA's native gather wins. Per-row DMA issue
rate caps this kernel at ~8-11M rows/s, while XLA's gather reaches
~40-160M rows/s once rows are >= 64 floats wide (below that XLA falls
onto a per-column path — the reason the mesh tables in
:mod:`tetranerf_tpu.geometry.mesh` are padded). Kept as a tested,
benchmarkable baseline to revisit on hardware with faster DMA issue or a
SparseCore path; see README "performance notes".

Constraints: ``table``'s last dim must be a multiple of 128 floats
(Mosaic HBM tiling), ``len(indices)`` a multiple of ``block_rows``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(num_buffers, idx_ref, tab_ref, out_ref, scratch, sems):
    block_rows = out_ref.shape[0]

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            tab_ref.at[pl.ds(idx_ref[i], 1), :],
            scratch.at[pl.ds(slot, 1)],
            sems.at[slot],
        )

    for i in range(num_buffers):
        get_dma(i, i).start()

    def body(i, _):
        slot = jax.lax.rem(i, num_buffers)
        get_dma(slot, i).wait()
        out_ref[pl.ds(i, 1), :] = scratch[pl.ds(slot, 1), :]

        @pl.when(i + num_buffers < block_rows)
        def _():
            get_dma(slot, i + num_buffers).start()

        return 0

    jax.lax.fori_loop(0, block_rows, body, 0)


@functools.partial(
    jax.jit, static_argnames=("block_rows", "num_buffers", "interpret")
)
def pallas_gather_rows(
    indices,
    table,
    block_rows: int = 1024,
    num_buffers: int = 16,
    interpret: bool = False,
):
    """``table[indices]`` via per-row DMA. See module docstring."""
    num, dim = len(indices), table.shape[-1]
    if num % block_rows:
        raise ValueError(f"len(indices)={num} not a multiple of {block_rows}")
    if dim % 128:
        raise ValueError(f"table width {dim} not a multiple of 128")
    kernel = functools.partial(_gather_kernel, num_buffers)
    return pl.pallas_call(
        kernel,
        grid=(num // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows,), lambda g: (g,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, dim), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((num_buffers, dim), table.dtype),
            pltpu.SemaphoreType.DMA((num_buffers,)),
        ],
        out_shape=jax.ShapeDtypeStruct((num, dim), table.dtype),
        interpret=interpret,
    )(indices.astype(jnp.int32), table)
