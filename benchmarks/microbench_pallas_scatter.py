"""Pallas VMEM-window scatter-add vs XLA scatter on real TPU.

Measures the kernel from ``ops/pallas_scatter`` at the training step's
actual shapes (N ~ rays x (T+4) stream rows into [100k, 64]) for several
window sizes, on both uniform-random indices and march-like indices
(spatially-coherent runs, many near-duplicates).

Usage: python benchmarks/microbench_pallas_scatter.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tetranerf_tpu.ops.pallas_scatter import scatter_add_rows
from tetranerf_tpu.utils.profiling import benchmark

V = 100_000
F = 64


def marchlike_indices(rng, num_rays, per_ray):
    """Index streams resembling the marcher's: per-ray sorted-ish walks."""
    starts = rng.integers(0, V, num_rays)
    steps = rng.integers(-40, 44, (num_rays, per_ray)).cumsum(axis=1)
    return ((starts[:, None] + steps) % V).astype(np.int32).reshape(-1)


def main():
    rng = np.random.default_rng(0)
    for n in (500_000, 2_000_000):
        rows = jnp.asarray(rng.standard_normal((n, F), dtype=np.float32))
        cases = {
            "uniform": [
                jnp.asarray(rng.integers(0, V, n, dtype=np.int32))
                for _ in range(3)
            ],
            "marchlike": [
                jnp.asarray(marchlike_indices(rng, n // 244, 244))
                for _ in range(3)
            ],
        }
        for name, idx_sets in cases.items():
            m = int(idx_sets[0].shape[0])  # marchlike rounds n down to rays*244
            base = benchmark(
                jax.jit(
                    lambda i, r: jnp.zeros((V, F), jnp.float32)
                    .at[i]
                    .add(r)
                    .sum()
                ),
                [(i, rows[:m]) for i in idx_sets],
            )
            print(
                f"N={m:>9,} {name:10s} xla            "
                f"{base*1e3:8.2f} ms {m/base/1e6:8.1f} M rows/s"
            )
            for w in (8192, 16384):
                fn = jax.jit(
                    lambda i, r, w=w: scatter_add_rows(
                        i, r, num_rows=V, window_rows=w
                    ).sum()
                )
                dt = benchmark(fn, [(i, rows[:m]) for i in idx_sets])
                print(
                    f"N={m:>9,} {name:10s} pallas w={w:<6d} "
                    f"{dt*1e3:8.2f} ms {m/dt/1e6:8.1f} M rows/s"
                )
        del rows, cases


if __name__ == "__main__":
    main()
