"""True device time of the fused-MLP kernel vs the XLA chain: N chained
iterations inside ONE jitted program (each iteration data-depends on the
last), one scalar fetch — tunnel dispatch overhead amortizes to zero.

Run: python -u benchmarks/microbench_fused_mlp2.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_ITERS = 20


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best / N_ITERS


def main():
    from tetranerf_tpu.models import nn
    from tetranerf_tpu.ops import pallas_mlp

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

    def chain(step):
        def run(xv, hdv):
            def body(_, carry):
                xc, acc = carry
                val = step(xc, hdv)
                # Data dependency: next input scaled by a near-1 factor.
                return xc * (1.0 + 1e-12 * val), acc + val

            _, acc = jax.lax.fori_loop(0, N_ITERS, body, (xv, 0.0))
            return acc

        return jax.jit(run)

    def fused_step(xv, hdv):
        rgb, dens = pallas_mlp.fused_field_mlps(
            (3, 1, "bfloat16", None), xv, hdv, *weights
        )
        return rgb.sum() + dens.sum()

    def xla_step(xv, hdv):
        h = xv.reshape(R * S, D).astype(jnp.bfloat16)
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
        hd2 = jnp.broadcast_to(
            hdv[:, None, :], (R, S, H)
        ).reshape(R * S, H)
        hh = jax.nn.relu(
            jnp.dot(h, head[0]["kernel"][27 : 27 + H].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            + hd2
        ).astype(jnp.bfloat16)
        rgb = jax.nn.sigmoid(
            jnp.dot(hh, wc["kernel"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        )
        return rgb.sum() + dens.sum()

    def sum_step(xv, hdv):
        return xv.sum() + hdv[0, 0]

    for name, step in (
        ("fused kernel fwd", fused_step),
        ("xla chain fwd", xla_step),
        ("sum(x) bandwidth floor", sum_step),
    ):
        dt = timed(chain(step), x, hd)
        print(f"{name:38s} {dt * 1e3:8.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
