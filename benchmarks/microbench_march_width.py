"""Scan-style sequential gather throughput vs table row width.

The march performs T sequential rounds of gathering R rows from the
packed [C, W] march table. Round-1 measurements suggested rows narrower
than 64 floats hit a slower per-column gather path; this measures the
actual scan-gather at march shapes for several widths (the gather chain
is made data-dependent across steps, like the real neighbor chase).

Usage: python -u benchmarks/microbench_march_width.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tetranerf_tpu.utils.profiling import benchmark

C, R, T = 646_406, 8192, 240


def main():
    rng = np.random.default_rng(0)
    # Next-pointer column so each step's gather depends on the previous
    # (the real adjacency chase), preventing XLA from batching steps.
    nxt = rng.integers(0, C, C, dtype=np.int32)
    starts = [
        jnp.asarray(rng.integers(0, C, R, dtype=np.int32)) for _ in range(3)
    ]
    for width in (24, 32, 64, 128):
        table = np.asarray(
            rng.standard_normal((C, width)), np.float32
        )
        table[:, 0] = nxt.astype(np.float32)  # not used for chase
        tab = jnp.asarray(table)
        nxt_dev = jnp.asarray(nxt)

        def run(tab, nxt_dev, c0):
            def step(carry, _):
                c, acc = carry
                row = tab[c]
                acc = acc + row.sum(axis=-1)
                c = nxt_dev[c]
                return (c, acc), None

            (c, acc), _ = jax.lax.scan(
                step, (c0, jnp.zeros(R, jnp.float32)), None, length=T
            )
            return acc.sum() + c.sum()

        f = jax.jit(run)
        dt = benchmark(f, [(tab, nxt_dev, s) for s in starts], warmup=2, repeats=3)
        rows_per_s = R * T / dt
        print(
            f"W={width:4d} ({width * 4:4d}B)  {dt * 1e3:8.2f} ms  "
            f"{rows_per_s / 1e6:7.1f} M rows/s  "
            f"{rows_per_s * width * 4 / 1e9:6.1f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
