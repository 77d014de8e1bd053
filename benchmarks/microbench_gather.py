"""Microbenchmarks of the traversal's core memory primitives on real TPU.

Answers, with measurements (docs/RESULTS.md records the conclusions):
1. sequential scan-chained gather: per-iteration overhead vs row cost,
   as a function of rays-per-step and row width (24/64/128/256 f32);
2. one-shot wide gather row rate vs total rows;
3. scatter-add row rate (the interpolation backward) vs rows and width;
4. whether rates degrade past 8K rays (round-1 open question).

Usage: python benchmarks/microbench_gather.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tetranerf_tpu.utils.profiling import benchmark

C = 646_406  # table rows, sized like the bench scene's cell count
V = 100_000


def main():
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    print("== scan-chained gather (march model): iters x gather(R rows) ==")
    for width in (24, 64, 128, 256):
        table = jnp.asarray(rng.normal(size=(C, width)).astype(np.float32))
        for R in (4096, 8192, 16384, 32768):
            for iters in (60, 240):
                @functools.partial(jax.jit, static_argnames=("n",))
                def chain(table, idx0, n):
                    def step(c, _):
                        row = table[c]
                        # feed first column back into the index: a true
                        # sequential dependency like the march
                        nxt = (
                            c
                            + jax.lax.bitcast_convert_type(
                                row[:, 0], jnp.int32
                            )
                            % 97
                        ) % C
                        return nxt, row[:, 1].sum()
                    _, out = jax.lax.scan(step, idx0, None, length=n)
                    return out.sum()

                idxs = [
                    jnp.asarray(rng.integers(0, C, R).astype(np.int32))
                    for _ in range(4)
                ]
                dt = benchmark(
                    lambda i: chain(table, i, iters), [(i,) for i in idxs],
                    warmup=1, repeats=2,
                )
                per_iter = dt / iters
                rate = R / per_iter / 1e6
                print(
                    f"w={width:4d} R={R:6d} iters={iters:4d}: "
                    f"{dt*1e3:7.2f} ms total, {per_iter*1e6:7.1f} us/iter, "
                    f"{rate:7.1f} M rows/s"
                )

    print("== one-shot gather ==")
    for width in (64, 128):
        table = jnp.asarray(rng.normal(size=(C, width)).astype(np.float32))
        for n in (1 << 20, 1 << 22, 1 << 23):
            f = jax.jit(lambda i: table[i].sum())
            idxs = [
                jnp.asarray(rng.integers(0, C, n).astype(np.int32))
                for _ in range(3)
            ]
            dt = benchmark(f, [(i,) for i in idxs], warmup=1, repeats=2)
            print(
                f"w={width:4d} rows={n:9d}: {dt*1e3:7.2f} ms, "
                f"{n/dt/1e6:7.1f} M rows/s, {n*width*4/dt/1e9:6.1f} GB/s"
            )

    print("== scatter-add (interpolation backward model) ==")
    for width in (64,):
        for n in (1 << 20, 1 << 22):
            vals = jnp.asarray(rng.normal(size=(n, width)).astype(np.float32))
            f = jax.jit(
                lambda i, v: jnp.zeros((V, width), jnp.float32).at[i].add(v).sum()
            )
            idxs = [
                jnp.asarray(rng.integers(0, V, n).astype(np.int32))
                for _ in range(3)
            ]
            dt = benchmark(f, [(i, vals) for i in idxs], warmup=1, repeats=2)
            print(
                f"w={width:4d} rows={n:9d}: {dt*1e3:7.2f} ms, "
                f"{n/dt/1e6:7.1f} M rows/s"
            )

    print("== scatter-add via segment_sum after sort ==")
    for n in (1 << 22,):
        vals = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))

        def sorted_scatter(i, v):
            order = jnp.argsort(i)
            return (
                jnp.zeros((V, 64), jnp.float32)
                .at[i[order]]
                .add(v[order], mode="drop", unique_indices=False)
                .sum()
            )

        f = jax.jit(sorted_scatter)
        idxs = [
            jnp.asarray(rng.integers(0, V, n).astype(np.int32))
            for _ in range(3)
        ]
        dt = benchmark(f, [(i, vals) for i in idxs], warmup=1, repeats=2)
        print(f"sorted rows={n:9d}: {dt*1e3:7.2f} ms, {n/dt/1e6:7.1f} M rows/s")


if __name__ == "__main__":
    main()
