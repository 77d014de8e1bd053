"""Chained-iteration device times: fused vs XLA MLP stack, fwd and
fwd+bwd, plus the density-only coarse variant — at both coarse and fine
sample counts.

Run: python -u benchmarks/microbench_fused_mlp_bwd.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_ITERS = 10


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best / N_ITERS


def main():
    from tetranerf_tpu.models import TetraNerf
    from tetranerf_tpu.models.config import TetrahedraNerfConfig

    R = 8192
    cfg0 = TetrahedraNerfConfig(
        num_tetrahedra_vertices=1, num_tetrahedra_cells=1
    )

    class Shell(TetraNerf):
        def __init__(self, config):
            self.config = config
            self.num_train_images = 0
            from tetranerf_tpu.ops.encoding import nerf_encoding_dim

            self._mlp_in_dim = config.field_dim
            self._dir_enc_dim = nerf_encoding_dim(3, 4)
            self._head_in_dim = config.hidden_size + self._dir_enc_dim

    from tetranerf_tpu.models import nn

    model = Shell(cfg0)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    params = {
        "mlp_base": nn.mlp_init(ks[0], 64, 3, 128),
        "mlp_head": nn.mlp_init(ks[1], model._head_in_dim, 1, 128),
        "field_output_color": nn.linear_init(ks[2], 128, 3),
        "field_output_density": nn.linear_init(ks[3], 128, 1),
    }
    d = jax.random.normal(ks[5], (R, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def chain(stage, x):
        def run(prm, xv):
            def body(_, carry):
                xc, acc = carry
                val = stage(prm, xc)
                return xc * (1.0 + 1e-14 * val), acc + val

            _, acc = jax.lax.fori_loop(0, N_ITERS, body, (xv, 0.0))
            return acc

        return jax.jit(run), x

    def report(name, stage, x):
        fn, xv = chain(stage, x)
        print(f"{name:48s} {timed(fn, params, xv) * 1e3:8.2f} ms",
              flush=True)

    for S in (128, 257):
        x = jax.random.normal(ks[4], (R, S, 64), jnp.float32)
        for fused in (True, False):
            cfg = dataclasses.replace(cfg0, fused_mlps=fused)
            m = Shell(cfg)

            def fwd(prm, xv, m=m):
                rgb, dens = m._field_mlps_remat(prm, xv, d, None, True)
                return rgb.sum() + dens.sum()

            def fwd_bwd(prm, xv, m=m):
                def loss(p):
                    rgb, dens = m._field_mlps_remat(p, xv, d, None, True)
                    return jnp.sum(jnp.square(rgb)) + jnp.sum(dens)

                g = jax.grad(loss)(prm)
                return g["mlp_base"][0]["kernel"].sum()

            def dens_fwd_bwd(prm, xv, m=m):
                def loss(p):
                    dens = m._density_mlp(p, xv, d, None, True)
                    return jnp.sum(dens)

                g = jax.grad(loss)(prm)
                return g["mlp_base"][0]["kernel"].sum()

            tag = "fused" if fused else "xla"
            report(f"S={S} {tag} fwd", fwd, x)
            report(f"S={S} {tag} fwd+bwd", fwd_bwd, x)
            report(f"S={S} {tag} density-only fwd+bwd", dens_fwd_bwd, x)


if __name__ == "__main__":
    main()
