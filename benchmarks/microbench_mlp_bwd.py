"""Why does the MLP-head fwd+bwd cost ~24 ms when its forward is 2.5 ms?

Times grad of the field-MLP stack at bench shapes ([8192, 128, 64]
features) with remat on/off, and isolates render_weights' backward.

Run: python -u benchmarks/microbench_mlp_bwd.py
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
    p.add_argument("--rays", type=int, default=8192)
    p.add_argument("--num-samples", type=int, default=128)
    args = p.parse_args()

    from tetranerf_tpu.geometry import build_mesh
    from tetranerf_tpu.models import TetraNerf
    from tetranerf_tpu.ops.rendering import render_weights
    from tetranerf_tpu.training import tetranerf_preset
    from tetranerf_tpu.utils import make_sphere_scene
    from tetranerf_tpu.utils.profiling import benchmark

    points, colors = make_sphere_scene(2000, seed=0)
    mesh = build_mesh(points)
    # On device once: jitted closures over a numpy mesh would embed
    # the tables as HLO constants.
    mesh = jax.device_put(mesh)
    config = tetranerf_preset()
    model = TetraNerf(config.model, mesh)
    params = model.init_params(jax.random.PRNGKey(0), colors)

    R, S = args.rays, args.num_samples
    rng = np.random.default_rng(0)

    def make_args():
        fv = jnp.asarray(rng.normal(size=(R, S, 64)).astype(np.float32))
        d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
        dl = jnp.asarray(
            rng.uniform(0.001, 0.01, size=(R, S)).astype(np.float32)
        )
        return fv, d, dl

    arg_sets = [make_args() for _ in range(4)]

    def report(name, fn, args_list):
        dt = benchmark(fn, args_list, warmup=1, repeats=3)
        print(f"{name:52s} {dt * 1e3:8.2f} ms", flush=True)

    def heads(prm, fv, d, remat):
        if remat:
            return model._field_mlps_remat(prm, fv, d, None, True)
        return model._field_mlps(prm, fv, d, None, True)

    # forward only
    for remat in (True, False):
        f = jax.jit(
            lambda prm, fv, d, dl, r=remat: heads(prm, fv, d, r)[0].sum()
        )
        report(f"heads fwd (remat={remat})", f, [(params, *a) for a in arg_sets])

    # fwd+bwd wrt params AND features (the real cotangent path)
    for remat in (True, False):
        def loss(prm, fv, d, dl, r=remat):
            rgb, dens = heads(prm, fv, d, r)
            w = render_weights(dens, dl)
            return (w[..., None] * rgb).sum()

        f = jax.jit(
            lambda prm, fv, d, dl, r=remat: jax.grad(loss, argnums=(0, 1))(
                prm, fv, d, dl
            )[1].sum()
        )
        report(f"heads+weights fwd+bwd (remat={remat})", f,
               [(params, *a) for a in arg_sets])

    # density-only path (what the coarse round needs)
    for remat in (True, False):
        def dloss(prm, fv, d, dl, r=remat):
            _, dens = heads(prm, fv, d, r)
            w = render_weights(dens, dl)
            return w.sum()

        f = jax.jit(
            lambda prm, fv, d, dl, r=remat: jax.grad(dloss, argnums=(0, 1))(
                prm, fv, d, dl
            )[1].sum()
        )
        report(f"density+weights fwd+bwd (remat={remat})", f,
               [(params, *a) for a in arg_sets])

    # render_weights backward alone
    def wloss(dens, dl):
        return render_weights(dens, dl).sum()

    dens_sets = [
        (jnp.abs(a[0][..., 0]) * 10.0, a[2]) for a in arg_sets
    ]
    f = jax.jit(lambda dens, dl: jax.grad(wloss)(dens, dl).sum())
    report("render_weights fwd+bwd alone", f, dens_sets)


if __name__ == "__main__":
    main()
