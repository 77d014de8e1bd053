"""Cumsum along the minor (lane) axis: XLA's native lowering vs an
upper-triangular matmul on the MXU.

A prefix sum is ``x @ U`` with ``U[k, j] = 1[k <= j]`` — one MXU pass,
and its transpose (the backward) is ``g @ U^T``, another single pass.

Finding (TPU v5e, 2026-08-19): at [8192, {128..512}] BOTH variants are
far below this host's ~35-40 ms per-sync dispatch-latency floor — the
op itself costs <0.5 ms either way and is NOT a train-step bottleneck.
Kept as the harness that exposed the floor (16-deep pipelining below).

Run: python -u benchmarks/microbench_cumsum.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tetranerf_tpu.utils.profiling import benchmark


def matmul_cumsum(x):
    n = x.shape[-1]
    tri = jnp.triu(jnp.ones((n, n), x.dtype))
    return jax.lax.dot_general(
        x,
        tri,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def main():
    rng = np.random.default_rng(0)
    for shape in ((8192, 128), (8192, 256), (8192, 512)):
        xs = [
            jnp.asarray(rng.uniform(0, 0.1, size=shape).astype(np.float32))
            for _ in range(16)
        ]

        def report(name, fn):
            dt = benchmark(jax.jit(fn), [(x,) for x in xs], warmup=1, repeats=3)
            print(f"{shape} {name:32s} {dt * 1e3:8.3f} ms", flush=True)

        report("jnp.cumsum fwd", lambda x: jnp.cumsum(x, axis=-1).sum())
        report("matmul cumsum fwd", lambda x: matmul_cumsum(x).sum())
        report(
            "jnp.cumsum fwd+bwd",
            lambda x: jax.grad(
                lambda y: (jnp.cumsum(y, axis=-1) ** 2).sum()
            )(x).sum(),
        )
        report(
            "matmul cumsum fwd+bwd",
            lambda x: jax.grad(lambda y: (matmul_cumsum(y) ** 2).sum())(
                x
            ).sum(),
        )
        # numeric check
        a = np.asarray(jnp.cumsum(xs[0], axis=-1))
        b = np.asarray(matmul_cumsum(xs[0]))
        print(
            f"{shape} max abs diff {np.abs(a - b).max():.3e} "
            f"(rel {np.abs((a - b) / np.maximum(np.abs(a), 1e-9)).max():.3e})"
        )


if __name__ == "__main__":
    main()
