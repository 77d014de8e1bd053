"""Bisect the backward pass to locate untracked cost.

Times ``jax.grad`` of each progressively larger slice of the forward at
bench shapes; consecutive deltas give each stage's fwd+bwd cost. Also
times the optimizer update alone and a real MSE loss step.

Run: python -u benchmarks/bisect_backward.py [--rays 8192]
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
    p.add_argument("--points", type=int, default=100_000)
    p.add_argument("--rays", type=int, default=8192)
    p.add_argument("--max-steps", type=int, default=240)
    p.add_argument("--num-samples", type=int, default=128)
    p.add_argument("--from-stage", type=int, default=0)
    args = p.parse_args()

    from tetranerf_tpu.geometry import build_mesh
    from tetranerf_tpu.models import RayBundle, TetraNerf
    from tetranerf_tpu.ops.fused import (
        biased_warp_range,
        march_features,
        ray_bounds,
        sample_features,
    )
    from tetranerf_tpu.ops.rendering import render_rgb_depth_acc, render_weights
    from tetranerf_tpu.ops.sampling import pdf_sample, stratified_bins
    from tetranerf_tpu.training import Trainer, make_optimizer, tetranerf_preset
    from tetranerf_tpu.utils import (
        make_sphere_scene,
        sample_sphere_rays,
        sphere_ray_targets,
    )
    from tetranerf_tpu.utils.profiling import benchmark

    points, colors = make_sphere_scene(args.points, seed=0)
    mesh = build_mesh(points, two_hop_table=False)
    # On device once: jitted closures over a numpy mesh would embed
    # the tables as HLO constants.
    mesh = jax.device_put(mesh)

    config = tetranerf_preset()
    config.model.num_samples = args.num_samples
    config.model.num_fine_samples = args.num_samples
    config.model.max_intersected_triangles = args.max_steps
    model = TetraNerf(config.model, mesh)
    trainer = Trainer(config, model, point_colors=colors, auto_tune_steps=False)
    params = trainer.state.params
    S = args.max_steps
    nsamp = args.num_samples
    cfg = model.config

    rng = np.random.default_rng(0)

    def make_rays():
        o, d = sample_sphere_rays(rng, args.rays)
        return jnp.asarray(o), jnp.asarray(d)

    ray_sets = [make_rays() for _ in range(4)]
    m = trainer.mesh_tables
    key = jax.random.PRNGKey(0)

    def report(name, fn, args_list):
        dt = benchmark(fn, args_list, warmup=1, repeats=2)
        print(f"{name:50s} {dt * 1e3:8.2f} ms", flush=True)

    def staged(prm, o, d, stage):
        res = march_features(m, prm["tetrahedra_field"], o, d, S)
        if stage == 0:  # endpoint features only
            return res.feats.sum()
        nears, fars, first, nk, mask = ray_bounds(res)
        k1, k2 = jax.random.split(key)
        bins01 = stratified_bins(k1, args.rays, nsamp)
        euclid = nears[:, None] + bins01 * (fars - nears)[:, None]
        euclid = biased_warp_range(res, first, nk, nears, fars, euclid)
        spacing = (euclid - nears[:, None]) / (fars - nears)[:, None]
        distances = (euclid[:, 1:] + euclid[:, :-1]) / 2.0
        deltas = euclid[:, 1:] - euclid[:, :-1]
        feats, smask = sample_features(res, distances, mask)
        if stage == 1:  # + coarse sample_features
            return feats.sum()
        rgb_c, dens_c = model._field_mlps_remat(prm, feats, d, None, True)
        dens_c = jnp.where(smask, dens_c, 0.0)
        w_c = render_weights(dens_c, deltas)
        if stage == 2:  # + coarse MLP + weights
            return w_c.sum()
        fine_spacing = pdf_sample(
            k2, spacing, jax.lax.stop_gradient(w_c), nsamp,
            include_original=True,
        )
        euclid2 = nears[:, None] + fine_spacing * (fars - nears)[:, None]
        d2 = (euclid2[:, 1:] + euclid2[:, :-1]) / 2.0
        dl2 = euclid2[:, 1:] - euclid2[:, :-1]
        feats2, smask2 = sample_features(res, d2, mask)
        if stage == 3:  # + pdf + fine sample_features
            return feats2.sum()
        rgb, dens = model._field_mlps_remat(prm, feats2, d, None, True)
        dens = jnp.where(smask2, dens, 0.0)
        if stage == 4:  # + fine MLP
            return rgb.sum() + dens.sum()
        spacing2 = (euclid2 - nears[:, None]) / (fars - nears)[:, None]
        s_mid = spacing2[:, 1:] + spacing2[:, :-1]
        from tetranerf_tpu.models.tetra_nerf import _gradient_scaler

        rgb, dens = _gradient_scaler(
            rgb, dens, jnp.clip(jnp.square(s_mid), 0.0, 1.0)
        )
        w = render_weights(dens, dl2)
        bg = jnp.ones((args.rays, 3), jnp.float32)
        rgb_o, acc, depth = render_rgb_depth_acc(
            w, rgb, d2, background_rgb=bg, depth_method=cfg.depth_method
        )
        if stage == 5:  # + render
            return rgb_o.sum()
        tgt = jnp.zeros((args.rays, 3), jnp.float32)
        return jnp.mean(jnp.square(rgb_o - tgt))  # stage 6: MSE loss

    names = [
        "grad: endpoint feats",
        "grad: + coarse sample_features",
        "grad: + coarse MLP + weights",
        "grad: + pdf + fine sample_features",
        "grad: + fine MLP",
        "grad: + render",
        "grad: + MSE loss",
    ]
    for stage, name in enumerate(names):
        if stage < args.from_stage:
            continue
        f = jax.jit(
            lambda prm, o, d, s=stage: jax.grad(
                lambda q: staged(q, o, d, s)
            )(prm)["tetrahedra_field"].sum()
        )
        report(name, f, [(params, *r) for r in ray_sets])

    # Optimizer update alone (grads = params-shaped ones).
    opt = make_optimizer(config)
    opt_state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    def opt_step(g, st, prm):
        updates, st2 = opt.update(g, st, prm)
        import optax

        prm2 = optax.apply_updates(prm, updates)
        return prm2["tetrahedra_field"].sum()

    f = jax.jit(opt_step)
    report("optimizer update alone", f, [(grads, opt_state, params)] * 4)


if __name__ == "__main__":
    main()
