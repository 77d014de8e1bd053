"""Forward+backward cost of the two sampling-path contractions.

1. interp_endpoints (samples <- endpoint feats): Pallas kernel vs XLA
   one-hot matmul (optionally rematerialized so the [R,S,T+1] weight
   tensor is rebuilt in the transpose instead of saved).
2. stream_blend (endpoint feats <- vertex stream): Pallas kernel vs XLA
   one-hot matmul built from pos/bary.

Usage: python -u benchmarks/microbench_interp_grad.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tetranerf_tpu.ops.pallas_interp import interp_endpoints, stream_blend
from tetranerf_tpu.utils.profiling import benchmark

R, T, F = 8192, 256, 64
S = 257  # fine round
U = T + 4
E = T + 1


def xla_interp(feats, k, frac, dtype=jnp.bfloat16):
    slots = jnp.arange(E, dtype=jnp.int32)[None, None, :]
    w = jnp.where(slots == k[..., None], (1.0 - frac)[..., None], 0.0)
    w = w + jnp.where(slots == (k + 1)[..., None], frac[..., None], 0.0)
    return jax.lax.dot_general(
        w.astype(dtype),
        feats.astype(dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def xla_blend(stream_field, pos, bary, dtype=jnp.bfloat16):
    slots = jnp.arange(U, dtype=jnp.int32)[None, None, None, :]
    b = jnp.sum(
        jnp.where(
            slots == pos[..., None], bary[..., None], 0.0
        ),
        axis=2,
    )  # [R, E, U]
    return jax.lax.dot_general(
        b.astype(dtype),
        stream_field.astype(dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def main():
    rng = np.random.default_rng(0)
    feats_sets = [
        jnp.asarray(rng.standard_normal((R, E, F)).astype(np.float32))
        for _ in range(3)
    ]
    k = jnp.asarray(rng.integers(0, T - 1, (R, S)).astype(np.int32))
    frac = jnp.asarray(rng.random((R, S)).astype(np.float32))

    cases = {
        "interp pallas": lambda ft: interp_endpoints(ft, k, frac, False),
        "interp xla": lambda ft: xla_interp(ft, k, frac),
        "interp xla remat": jax.checkpoint(
            lambda ft: xla_interp(ft, k, frac)
        ),
    }
    for name, fn in cases.items():
        f = jax.jit(lambda ft, fn=fn: fn(ft).sum())
        fwd = benchmark(f, [(x,) for x in feats_sets], warmup=2, repeats=3)
        g = jax.jit(jax.grad(lambda ft, fn=fn: fn(ft).sum()))
        both = benchmark(g, [(x,) for x in feats_sets], warmup=2, repeats=3)
        print(
            f"{name:20s} fwd {fwd * 1e3:7.2f} ms   fwd+bwd "
            f"{both * 1e3:7.2f} ms",
            flush=True,
        )

    stream_sets = [
        jnp.asarray(rng.standard_normal((R, U, F)).astype(np.float32))
        for _ in range(3)
    ]
    pos = jnp.asarray(rng.integers(0, U, (R, E, 4)).astype(np.int32))
    bary = jnp.asarray(rng.random((R, E, 4)).astype(np.float32))

    cases = {
        "blend pallas": lambda sf: stream_blend(sf, pos, bary, False),
        "blend xla": lambda sf: xla_blend(sf, pos, bary),
        "blend xla remat": jax.checkpoint(
            lambda sf: xla_blend(sf, pos, bary)
        ),
    }
    for name, fn in cases.items():
        f = jax.jit(lambda sf, fn=fn: fn(sf).sum())
        fwd = benchmark(f, [(x,) for x in stream_sets], warmup=2, repeats=3)
        g = jax.jit(jax.grad(lambda sf, fn=fn: fn(sf).sum()))
        both = benchmark(g, [(x,) for x in stream_sets], warmup=2, repeats=3)
        print(
            f"{name:20s} fwd {fwd * 1e3:7.2f} ms   fwd+bwd "
            f"{both * 1e3:7.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
