"""Does index LOCALITY change TPU gather / scatter-add row rates?

The march, the endpoint-feature stream, and the backward field scatter
are all row-rate-bound (RESULTS.md: gather ~43-75M rows/s, scatter
28-47M rows/s at uniform-random indices), yet in-situ ops run 2-5x the
uniform-random microbench. If that gap is INDEX LOCALITY, then spatial
relabeling (Morton-ordered cells/vertices) and locality-ordered ray
batches are direct levers on every wall in the step. This measures the
gather/scatter rate vs index pattern:

- ``uniform``: iid uniform rows (the existing microbench's case)
- ``sorted``: the same multiset of rows, sorted (max locality)
- ``walk``: random walk with small steps (the march's per-ray pattern
  after a spatial relabel: consecutive steps hit nearby rows)
- ``block16``: random 16-row-aligned blocks, sequential inside
- ``cluster1k``: uniform within a random 1024-row window per 256 rows
  (what Morton-ordered vertices + locality-ordered rays produce in the
  feature stream)

Usage: python benchmarks/microbench_locality.py [--rows 646406]
           [--width 64] [--n 1000000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tetranerf_tpu.utils.profiling import benchmark


def patterns(rng, n, rows):
    out = {}
    uni = rng.integers(0, rows, size=n).astype(np.int32)
    out["uniform"] = uni
    out["sorted"] = np.sort(uni)
    step = rng.integers(-8, 9, size=n)
    out["walk"] = (np.cumsum(step) % rows).astype(np.int32)
    starts = rng.integers(0, max(rows - 16, 1), size=-(-n // 16))
    out["block16"] = (
        starts[:, None] + np.arange(16)[None, :]
    ).reshape(-1).astype(np.int32)[:n]
    g = 256
    wins = rng.integers(0, max(rows - 1024, 1), size=-(-n // g))
    offs = rng.integers(0, 1024, size=(-(-n // g), g))
    out["cluster1k"] = (wins[:, None] + offs).reshape(-1).astype(np.int32)[:n]
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=646406)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--n", type=int, default=1_000_000)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.standard_normal((args.rows, args.width)).astype(np.float32)
    )
    vals = jnp.asarray(
        rng.standard_normal((args.n, args.width)).astype(np.float32)
    )

    gather = jax.jit(lambda t, i: t[i])
    scatter = jax.jit(
        lambda t, i, v: jnp.zeros_like(t).at[i].add(v)
    )

    print(f"# table [{args.rows}, {args.width}] f32, {args.n} index rows")
    print(f"{'pattern':<12s} {'gather M rows/s':>16s} {'scatter M rows/s':>17s}")
    pats_a = patterns(rng, args.n, args.rows)
    pats_b = patterns(np.random.default_rng(1), args.n, args.rows)
    for name in pats_a:
        ia, ib = jnp.asarray(pats_a[name]), jnp.asarray(pats_b[name])
        tg = benchmark(gather, [(table, ia), (table, ib)])
        ts = benchmark(scatter, [(table, ia, vals), (table, ib, vals)])
        print(
            f"{name:<12s} {args.n / tg / 1e6:>16.1f} {args.n / ts / 1e6:>17.1f}"
        )


if __name__ == "__main__":
    main()
