"""Merging two per-row-sorted arrays (the PDF sampler's
``include_original`` merge): scatter-by-rank vs ``jnp.sort`` of the
concatenation vs a one-hot masked-sum placement.

The trace (benchmarks/trace_step.py, 2026-08-19) showed the rank-scatter
at ~10 ms/step ([8192, 129] + [8192, 129] -> [8192, 258]): XLA lowers
the two row scatters to serial per-row RMW at ~2 GiB/s. Both rank
arrays are permutations, so placement is expressible as a one-hot
reduction the VPU vectorizes — or the whole merge as one lane-axis sort.

Run: python -u benchmarks/microbench_merge.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tetranerf_tpu.utils.profiling import benchmark


def merge_scatter(a, b):
    n, m = a.shape[-1], b.shape[-1]
    rank_a = jnp.sum((b[:, None, :] < a[:, :, None]), axis=-1) + jnp.arange(n)
    rank_b = jnp.sum((a[:, None, :] <= b[:, :, None]), axis=-1) + jnp.arange(m)
    out = jnp.zeros((a.shape[0], n + m), a.dtype)
    rows = jnp.arange(a.shape[0])[:, None]
    out = out.at[rows, rank_a].set(a)
    out = out.at[rows, rank_b].set(b)
    return out


def merge_sort(a, b):
    return jnp.sort(jnp.concatenate([a, b], axis=-1), axis=-1)


def merge_onehot(a, b):
    n, m = a.shape[-1], b.shape[-1]
    rank_a = jnp.sum((b[:, None, :] < a[:, :, None]), axis=-1) + jnp.arange(n)
    rank_b = jnp.sum((a[:, None, :] <= b[:, :, None]), axis=-1) + jnp.arange(m)
    slots = jnp.arange(n + m, dtype=jnp.int32)[None, None, :]
    out = jnp.sum(
        jnp.where(slots == rank_a[:, :, None], a[:, :, None], 0.0), axis=1
    )
    out = out + jnp.sum(
        jnp.where(slots == rank_b[:, :, None], b[:, :, None], 0.0), axis=1
    )
    return out


def main():
    rng = np.random.default_rng(0)
    R, N = 8192, 129
    a_sets = [
        jnp.asarray(np.sort(rng.uniform(size=(R, N)), axis=-1).astype(np.float32))
        for _ in range(8)
    ]
    b_sets = [
        jnp.asarray(np.sort(rng.uniform(size=(R, N)), axis=-1).astype(np.float32))
        for _ in range(8)
    ]
    args = list(zip(a_sets, b_sets))

    fns = {
        "scatter-by-rank": merge_scatter,
        "jnp.sort(concat)": merge_sort,
        "one-hot sum": merge_onehot,
    }
    ref = np.sort(
        np.concatenate([np.asarray(a_sets[0]), np.asarray(b_sets[0])], -1), -1
    )
    for name, fn in fns.items():
        got = np.asarray(jax.jit(fn)(a_sets[0], b_sets[0]))
        ok = np.allclose(got, ref)
        dt = benchmark(
            jax.jit(lambda a, b, f=fn: f(a, b).sum()),
            args,
            warmup=1,
            repeats=3,
            min_dispatches=32,
        )
        print(f"{name:24s} {dt*1e3:8.3f} ms  correct={ok}", flush=True)


if __name__ == "__main__":
    main()
