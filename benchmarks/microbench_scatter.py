"""Microbenchmarks of scatter-add strategies for the field gradient.

The interpolation backward must accumulate N bary-weighted gradient rows
into the [V, F] vertex field (the transpose of the endpoint gather).
Round-2 profiling showed XLA scatter-add runs at ~34M rows/s on v5e —
233 ms at 8192 rays x 241 endpoints x 4 vertices. This benchmark sizes
the alternatives:

1. xla-scatter: plain ``.at[idx].add(rows)`` (baseline).
2. xla-scatter-sorted: same rows pre-sorted by index, with
   ``indices_are_sorted`` — does XLA exploit sortedness?
3. sort+scatter: ``lax.sort_key_val`` on (idx, position), gather rows into
   sorted order, then sorted scatter. Prices the full sort-based pipeline.
4. segment-sum-sorted: sorted rows + ``jax.ops.segment_sum``.
5. onehot-matmul window: MXU scatter for pre-binned rows (upper bound).

Usage: python benchmarks/microbench_scatter.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tetranerf_tpu.utils.profiling import benchmark

V = 100_000
F = 64


def main():
    rng = np.random.default_rng(0)

    for n in (1_000_000, 2_000_000, 4_000_000, 8_000_000):
        print(f"--- N = {n:,} rows -> [{V}, {F}] ---")
        idx_sets = [
            jnp.asarray(rng.integers(0, V, n, dtype=np.int32))
            for _ in range(3)
        ]
        rows = jnp.asarray(rng.standard_normal((n, F), dtype=np.float32))

        def xla_scatter(idx, rows):
            return jnp.zeros((V, F), jnp.float32).at[idx].add(rows)

        dt = benchmark(jax.jit(xla_scatter), [(i, rows) for i in idx_sets])
        print(f"xla-scatter unsorted      {dt*1e3:8.2f} ms  {n/dt/1e6:8.1f} M rows/s")

        sorted_sets = [jnp.sort(i) for i in idx_sets]

        def xla_scatter_sorted(idx, rows):
            return jnp.zeros((V, F), jnp.float32).at[idx].add(
                rows, indices_are_sorted=True
            )

        dt = benchmark(
            jax.jit(xla_scatter_sorted), [(i, rows) for i in sorted_sets]
        )
        print(f"xla-scatter sorted-flag   {dt*1e3:8.2f} ms  {n/dt/1e6:8.1f} M rows/s")

        def seg_sorted(idx, rows):
            return jax.ops.segment_sum(
                rows, idx, num_segments=V, indices_are_sorted=True
            )

        dt = benchmark(jax.jit(seg_sorted), [(i, rows) for i in sorted_sets])
        print(f"segment-sum sorted        {dt*1e3:8.2f} ms  {n/dt/1e6:8.1f} M rows/s")

        def sort_only(idx):
            return jax.lax.sort_key_val(idx, jnp.arange(n, dtype=jnp.int32))

        dt = benchmark(jax.jit(sort_only), [(i,) for i in idx_sets])
        print(f"sort_key_val (i32,i32)    {dt*1e3:8.2f} ms")

        def full_pipeline(idx, rows):
            skey, pos = jax.lax.sort_key_val(
                idx, jnp.arange(n, dtype=jnp.int32)
            )
            srows = rows[pos]
            return jax.ops.segment_sum(
                srows, skey, num_segments=V, indices_are_sorted=True
            )

        dt = benchmark(jax.jit(full_pipeline), [(i, rows) for i in idx_sets])
        print(f"sort+gather+segsum        {dt*1e3:8.2f} ms  {n/dt/1e6:8.1f} M rows/s")
        del idx_sets, sorted_sets, rows

    # MXU upper bound: rows pre-binned into 512-vertex windows; accumulate
    # each bin with a one-hot matmul. Prices binned-scatter compute only.
    n, w = 2_000_000, 512
    idx = jnp.asarray(rng.integers(0, w, n, dtype=np.int32))
    rows = jnp.asarray(rng.standard_normal((n, F), dtype=np.float32))

    def onehot_win(idx, rows):
        oh = (
            idx[:, None] == jnp.arange(w, dtype=jnp.int32)[None, :]
        ).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            oh,
            rows.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dt = benchmark(jax.jit(onehot_win), [(idx, rows)])
    print(f"onehot-matmul 2M->512 bin {dt*1e3:8.2f} ms  {n/dt/1e6:8.1f} M rows/s")


if __name__ == "__main__":
    main()
