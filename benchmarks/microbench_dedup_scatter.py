"""Can batch-global vertex dedup beat the dense backward field scatter?

The backward's dominant op scatters ~850k (ray, vertex)-stream rows into
the [V, 64] field gradient at the ~58M rows/s scatter wall — but the
batch touches at most V unique vertices (~100k here). A dedup pipeline
(sort keys, permute rows, reduce runs) only pays off if some stage runs
faster than the generic scatter; since any masked/compacting scatter
still pays per input row, the decisive question is whether XLA's
``indices_are_sorted`` hint unlocks a faster scatter lowering on TPU.
This measures each candidate stage at bench shapes:

- dense scatter-add (the current op, unhinted)
- scatter-add of PRE-SORTED indices with ``indices_are_sorted=True``
- ``segment_sum`` with sorted ids + ``num_segments=V``
- the N-key sort alone, and the N-row permute alone (pipeline inputs)

Usage: python benchmarks/microbench_dedup_scatter.py [--n 850000]
           [--verts 100000] [--width 64]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=850_000)
    p.add_argument("--verts", type=int, default=100_000)
    p.add_argument("--width", type=int, default=64)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    vids = [
        rng.integers(0, args.verts, size=args.n).astype(np.int32)
        for _ in range(2)
    ]
    svids = [np.sort(v) for v in vids]
    rows = jnp.asarray(
        rng.standard_normal((args.n, args.width)).astype(np.float32)
    )

    zeros = jnp.zeros((args.verts, args.width), jnp.float32)
    dense = jax.jit(lambda v, g: zeros.at[v].add(g))
    hinted = jax.jit(
        lambda v, g: zeros.at[v].add(
            g, indices_are_sorted=True, unique_indices=False
        )
    )
    segsum = jax.jit(
        lambda v, g: jax.ops.segment_sum(
            g, v, num_segments=args.verts, indices_are_sorted=True
        )
    )
    sort_only = jax.jit(
        lambda v: jax.lax.sort(
            (v, jnp.arange(v.shape[0], dtype=jnp.int32)), num_keys=1
        )
    )
    permute = jax.jit(lambda g, i: g[i])

    perm = [
        jnp.asarray(rng.permutation(args.n).astype(np.int32))
        for _ in range(2)
    ]
    dv = [jnp.asarray(v) for v in vids]
    dsv = [jnp.asarray(v) for v in svids]

    def report(name, t):
        print(f"{name:<24s} {t*1e3:8.2f} ms  ({args.n/t/1e6:6.1f} M rows/s)")

    print(f"# N={args.n} rows width {args.width} into [{args.verts}] verts")
    report("dense scatter", benchmark(dense, [(dv[0], rows), (dv[1], rows)]))
    report(
        "sorted+hint scatter",
        benchmark(hinted, [(dsv[0], rows), (dsv[1], rows)]),
    )
    report(
        "sorted segment_sum",
        benchmark(segsum, [(dsv[0], rows), (dsv[1], rows)]),
    )
    report("key sort alone", benchmark(sort_only, [(dv[0],), (dv[1],)]))
    report("row permute alone", benchmark(permute, [(rows, perm[0]), (rows, perm[1])]))


if __name__ == "__main__":
    main()
