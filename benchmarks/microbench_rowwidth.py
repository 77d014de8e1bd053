"""Random-row gather/scatter rate vs ROW WIDTH and dtype on real TPU.

Settles whether the hot-path walls are row-RATE-bound (rows/s constant
regardless of row bytes — then narrowing rows buys nothing) or
row-BYTE-bound (rows/s scales with 1/bytes — then a bf16 stream /
packed march table directly halves the march+scatter walls). Earlier
notes recorded both ~43M rows/s (march, W=64 f32) and ~120M rows/s
(warm-profile march gather), so the doctrine needs a direct sweep.

Shapes mirror the train step: table ~650K rows (the bench mesh's march
table / field), 1M gathered rows (8K rays x ~128 effective crossings),
~100K-row scatter target (the field backward).

Usage: python benchmarks/microbench_rowwidth.py [--rows N] [--cells C]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=1_048_576)
    p.add_argument("--cells", type=int, default=650_000)
    p.add_argument("--verts", type=int, default=100_000)
    p.add_argument("--widths", type=int, nargs="*",
                   default=[8, 16, 32, 64, 128])
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tetranerf_tpu.utils.profiling import benchmark

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    n, c, v = args.rows, args.cells, args.verts
    idx_sets = [
        jax.random.randint(k, (n,), 0, c, jnp.int32)
        for k in jax.random.split(k1, 3)
    ]
    vidx_sets = [
        jax.random.randint(k, (n,), 0, v, jnp.int32)
        for k in jax.random.split(k2, 3)
    ]
    print(f"# devices: {jax.devices()}", flush=True)
    print(f"# {n} rows, gather table [{c}, W], scatter target [{v}, W]",
          flush=True)

    gather = jax.jit(lambda t, i: t[i])

    def scatter_fn(dtype):
        def f(tgt, rows, i):
            return tgt.at[i].add(rows.astype(tgt.dtype))

        return jax.jit(f)

    for w in args.widths:
        for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            tab = jax.random.normal(k3, (c, w), jnp.float32).astype(dt)
            sec = benchmark(gather, [(tab, i) for i in idx_sets])
            print(
                f"gather  W={w:4d} {dt_name}: {sec * 1e3:7.3f} ms  "
                f"{n / sec / 1e6:7.1f} M rows/s  "
                f"{n * w * dt.dtype.itemsize / sec / 1e9:7.1f} GB/s read",
                flush=True,
            )
        # scatter-add: f32 target; rows f32 vs bf16 (cast fused into the
        # scatter read side = half the stream-read bytes if byte-bound)
        tgt = jnp.zeros((v, w), jnp.float32)
        for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            rows = jax.random.normal(k3, (n, w), jnp.float32).astype(dt)
            sec = benchmark(
                scatter_fn(dt), [(tgt, rows, i) for i in vidx_sets]
            )
            print(
                f"scatter W={w:4d} {dt_name} rows -> f32: {sec * 1e3:7.3f} ms"
                f"  {n / sec / 1e6:7.1f} M rows/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
