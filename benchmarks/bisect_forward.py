"""Bisect the full forward pass to locate untracked cost.

Stages build up the model's `_forward` piece by piece at the bench
shapes. Run: python -u benchmarks/bisect_forward.py [--rays 8192]
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
    args = p.parse_args()

    from tetranerf_tpu.geometry import build_mesh
    from tetranerf_tpu.models import RayBundle, TetraNerf
    from tetranerf_tpu.ops.fused import march_features, ray_bounds, sample_features
    from tetranerf_tpu.ops.rendering import render_rgb_depth_acc, render_weights
    from tetranerf_tpu.ops.sampling import pdf_sample, stratified_bins
    from tetranerf_tpu.training import Trainer, tetranerf_preset
    from tetranerf_tpu.utils import make_sphere_scene, sample_sphere_rays
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
    fld = params["tetrahedra_field"]
    key = jax.random.PRNGKey(0)

    def report(name, fn, args_list):
        dt = benchmark(fn, args_list, warmup=1, repeats=2)
        print(f"{name:50s} {dt * 1e3:8.2f} ms", flush=True)

    from tetranerf_tpu.ops.fused import biased_warp_range

    def coarse(prm, o, d, with_mlp, with_fine_sample, with_fine_mlp, with_render):
        res = march_features(m, prm["tetrahedra_field"], o, d, S)
        nears, fars, first, nk, mask = ray_bounds(res)
        k1, k2 = jax.random.split(key)
        bins01 = stratified_bins(k1, args.rays, nsamp)
        euclid = nears[:, None] + bins01 * (fars - nears)[:, None]
        euclid = biased_warp_range(res, first, nk, nears, fars, euclid)
        spacing = (euclid - nears[:, None]) / (fars - nears)[:, None]
        distances = (euclid[:, 1:] + euclid[:, :-1]) / 2.0
        deltas = euclid[:, 1:] - euclid[:, :-1]
        feats, smask = sample_features(res, distances, mask)
        out = feats.sum()
        if with_mlp:
            rgb_c, dens_c = model._field_mlps(prm, feats, d, None, True)
            dens_c = jnp.where(smask, dens_c, 0.0)
            w_c = render_weights(dens_c, deltas)
            out = out + w_c.sum()
            if with_fine_sample:
                fine_spacing = pdf_sample(
                    k2, spacing, jax.lax.stop_gradient(w_c), nsamp,
                    include_original=True,
                )
                euclid2 = nears[:, None] + fine_spacing * (fars - nears)[:, None]
                d2 = (euclid2[:, 1:] + euclid2[:, :-1]) / 2.0
                dl2 = euclid2[:, 1:] - euclid2[:, :-1]
                feats2, smask2 = sample_features(res, d2, mask)
                out = out + feats2.sum()
                if with_fine_mlp:
                    rgb, dens = model._field_mlps(prm, feats2, d, None, True)
                    dens = jnp.where(smask2, dens, 0.0)
                    w = render_weights(dens, dl2)
                    out = out + w.sum()
                    if with_render:
                        bg = jnp.ones((args.rays, 3), jnp.float32)
                        rgb_o, acc, depth = render_rgb_depth_acc(
                            w, rgb, d2, background_rgb=bg,
                            depth_method=cfg.depth_method,
                        )
                        out = rgb_o.sum() + acc.sum() + depth.sum()
        return out

    stages = [
        ("coarse sample only", (False, False, False, False)),
        ("+ coarse MLP+weights", (True, False, False, False)),
        ("+ pdf + fine sample", (True, True, False, False)),
        ("+ fine MLP", (True, True, True, False)),
        ("+ render", (True, True, True, True)),
    ]
    for name, flags in stages:
        f = jax.jit(lambda prm, o, d, fl=flags: coarse(prm, o, d, *fl))
        report(name, f, [(params, *r) for r in ray_sets])


if __name__ == "__main__":
    main()
