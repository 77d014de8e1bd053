"""Isolate the fused-MLP Pallas kernel's throughput vs a same-FLOPs XLA
matmul chain, sweeping block sizes.

Run: python -u benchmarks/microbench_fused_mlp.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tetranerf_tpu.models import nn
    from tetranerf_tpu.ops import pallas_mlp
    from tetranerf_tpu.utils.profiling import benchmark

    R, S, D, H = 8192, 128, 64, 128
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    base = nn.mlp_init(ks[0], D, 3, H)
    head = nn.mlp_init(ks[1], 27 + H, 1, H)
    wc = nn.linear_init(ks[2], H, 3)
    wd = nn.linear_init(ks[3], H, 1)
    x = jax.random.normal(ks[4], (R, S, D), jnp.float32)
    hd = jax.random.normal(ks[5], (R, H), jnp.float32)

    weights = []
    for l in base:
        weights += [l["kernel"], l["bias"]]
    weights += [wd["kernel"], wd["bias"], head[0]["kernel"][27 : 27 + H]]
    weights += [wc["kernel"], wc["bias"]]

    def report(name, fn, args):
        dt = benchmark(fn, [args] * 3, warmup=1, repeats=3)
        print(f"{name:46s} {dt * 1e3:8.2f} ms", flush=True)

    for max_rows in (2048, 4096, 8192, 16384):
        orig = pallas_mlp._block_shape
        pallas_mlp._block_shape = lambda n, s, m, _mr=max_rows: orig(
            n, s, _mr
        )
        try:
            f = jax.jit(
                lambda xv, hdv: pallas_mlp.fused_field_mlps(
                    (3, 1, "bfloat16", None), xv, hdv, *weights
                )[0].sum()
            )
            report(f"fused fwd rows<={max_rows}", f, (x, hd))
        finally:
            pallas_mlp._block_shape = orig

    # Same-FLOPs XLA chain on flat [R*S, .] operands (no per-ray logic).
    x2 = x.reshape(R * S, D)

    def xla_chain(xv):
        h = xv.astype(jnp.bfloat16)
        for l in base:
            h = jax.nn.relu(
                jnp.dot(h, l["kernel"].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
                + l["bias"]
            ).astype(jnp.bfloat16)
        dens = jax.nn.softplus(
            jnp.dot(h, wd["kernel"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        )
        hh = jax.nn.relu(
            jnp.dot(h, head[0]["kernel"][27 : 27 + H].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        ).astype(jnp.bfloat16)
        rgb = jax.nn.sigmoid(
            jnp.dot(hh, wc["kernel"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        )
        return rgb.sum() + dens.sum()

    report("xla flat chain (activations in HBM)", jax.jit(xla_chain), (x2,))

    # Pure bandwidth floor: one pass over x.
    report("read x once (sum)", jax.jit(lambda xv: xv.sum()), (x,))


if __name__ == "__main__":
    main()
