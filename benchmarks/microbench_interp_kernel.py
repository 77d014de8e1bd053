"""Variants of the Pallas interp kernel, timed on real TPU.

The v1 kernel (fori_loop over rays, dynamic ref slicing, per-ray one-hot
build) measured ~31 ms for S=128 / ~90 ms for S=384 at 8192 rays — far
above its compute bound (~10-17 ms). Candidates:

v1: dynamic fori_loop per ray (baseline, = ops/pallas_interp).
v2: static python unroll over the ray block (no dynamic slicing).
v3: vectorized block build [rb, T+1, S] + static per-ray dots.
v4: batched dot_general (batch dim = ray), if Mosaic supports it.

Usage: python benchmarks/microbench_interp_kernel.py [--samples 384]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tetranerf_tpu.ops.pallas_interp import interp_endpoints
from tetranerf_tpu.utils.profiling import benchmark

R, T1, F = 8192, 241, 64


def _wt_rows(k_row, frac_row, n_end):
    n_s = k_row.shape[-1]
    slots = jax.lax.broadcasted_iota(jnp.int32, (n_end, n_s), 0)
    return jnp.where(slots == k_row, 1.0 - frac_row, 0.0) + jnp.where(
        slots == k_row + 1, frac_row, 0.0
    )


def v2_kernel(rb, k_ref, frac_ref, feats_ref, out_ref):
    for r in range(rb):  # static unroll
        w_t = _wt_rows(k_ref[r : r + 1, :], frac_ref[r : r + 1, :], T1)
        out_ref[r, :, :] = jax.lax.dot_general(
            w_t.astype(jnp.bfloat16),
            feats_ref[r, :, :].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def v3_kernel(rb, k_ref, frac_ref, feats_ref, out_ref):
    slots = jax.lax.broadcasted_iota(
        jnp.int32, (rb, T1, k_ref.shape[1]), 1
    )
    k = k_ref[:, None, :]
    fr = frac_ref[:, None, :]
    w_t = jnp.where(slots == k, 1.0 - fr, 0.0) + jnp.where(
        slots == k + 1, fr, 0.0
    )
    w_t = w_t.astype(jnp.bfloat16)
    for r in range(rb):
        out_ref[r, :, :] = jax.lax.dot_general(
            w_t[r],
            feats_ref[r, :, :].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def v4_kernel(rb, k_ref, frac_ref, feats_ref, out_ref):
    slots = jax.lax.broadcasted_iota(
        jnp.int32, (rb, T1, k_ref.shape[1]), 1
    )
    k = k_ref[:, None, :]
    fr = frac_ref[:, None, :]
    w_t = jnp.where(slots == k, 1.0 - fr, 0.0) + jnp.where(
        slots == k + 1, fr, 0.0
    )
    out_ref[:, :, :] = jax.lax.dot_general(
        w_t.astype(jnp.bfloat16),
        feats_ref[:, :, :].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def run(kernel_fn, rb, S, k, frac, feats):
    return pl.pallas_call(
        functools.partial(kernel_fn, rb),
        grid=(R // rb,),
        in_specs=[
            pl.BlockSpec((rb, S), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, S), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, T1, F), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rb, S, F), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, S, F), jnp.float32),
    )(k, frac, feats)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=384)
    args = p.parse_args()
    S = args.samples
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(0, T1 - 1, (R, S), dtype=np.int32))
    frac = jnp.asarray(rng.uniform(0, 1, (R, S)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((R, T1, F), dtype=np.float32))
    argsets = [(k, frac, feats)]

    dt = benchmark(
        jax.jit(lambda *a: interp_endpoints(a[2], a[0], a[1]).sum()), argsets
    )
    print(f"v1 dyn-loop rb=8      {dt*1e3:8.2f} ms")

    for rb in (8, 16):
        for name, kern in (("v2 unroll", v2_kernel), ("v3 vecbuild", v3_kernel)):
            try:
                fn = jax.jit(
                    lambda kk, ff, ft, kern=kern, rb=rb: run(kern, rb, S, kk, ff, ft).sum()
                )
                dt = benchmark(fn, argsets)
                print(f"{name} rb={rb:<3d}      {dt*1e3:8.2f} ms")
            except Exception as e:
                print(f"{name} rb={rb}: FAILED {str(e)[:120]}")
    for rb in (8,):
        try:
            fn = jax.jit(lambda kk, ff, ft: run(v4_kernel, rb, S, kk, ff, ft).sum())
            dt = benchmark(fn, argsets)
            print(f"v4 batched dot rb={rb} {dt*1e3:8.2f} ms")
        except Exception as e:
            print(f"v4 batched dot rb={rb}: FAILED {str(e)[:160]}")


if __name__ == "__main__":
    main()
