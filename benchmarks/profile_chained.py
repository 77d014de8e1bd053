"""Stage times of the train step via IN-JIT chained iterations.

Each stage runs N data-dependent iterations inside one jitted program
(iteration i+1's ray origins are perturbed by iteration i's scalar), so
tunnel dispatch overhead amortizes to ~zero — the only trustworthy
absolute timing on this environment (see docs/RESULTS.md on tunneled
timing pitfalls; the pipelined-dispatch harness still carries ~1-4 ms
per call).

Usage: python -u benchmarks/profile_chained.py [--rays 8192]
"""

from __future__ import annotations

import argparse
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
    p = argparse.ArgumentParser()
    p.add_argument("--points", type=int, default=100_000)
    p.add_argument("--rays", type=int, default=8192)
    p.add_argument("--max-steps", type=int, default=256)
    p.add_argument("--num-samples", type=int, default=128)
    args = p.parse_args()

    from tetranerf_tpu.geometry import build_mesh
    from tetranerf_tpu.models import RayBundle, TetraNerf
    from tetranerf_tpu.ops.fused import (
        march_features,
        ray_bounds,
        sample_features,
    )
    from tetranerf_tpu.ops.rendering import render_weights
    from tetranerf_tpu.training import Trainer, tetranerf_preset
    from tetranerf_tpu.utils import make_sphere_scene, sample_sphere_rays

    points, colors = make_sphere_scene(args.points, seed=0)
    mesh = build_mesh(points, two_hop_table=False)
    # On device once: jitted closures over a numpy mesh would embed
    # the tables as HLO constants.
    mesh = jax.device_put(mesh)
    print(f"# mesh: {mesh.num_vertices} verts, {mesh.num_cells} cells",
          flush=True)

    config = tetranerf_preset()
    config.model.num_samples = args.num_samples
    config.model.num_fine_samples = args.num_samples
    config.model.max_intersected_triangles = args.max_steps
    model = TetraNerf(config.model, mesh)
    trainer = Trainer(config, model, point_colors=colors,
                      auto_tune_steps=False)
    params = trainer.state.params
    S = args.max_steps
    m = trainer.mesh_tables

    rng = np.random.default_rng(0)
    o_np, d_np = sample_sphere_rays(rng, args.rays)
    o0, d0 = jnp.asarray(o_np), jnp.asarray(d_np)
    key = jax.random.PRNGKey(0)

    def chain(stage):
        """stage(params, o, d) -> scalar; iterate with o-perturbation."""

        def run(prm, o, d):
            def body(_, carry):
                oc, acc = carry
                val = stage(prm, oc, d)
                return oc * (1.0 + 1e-14 * val), acc + val

            _, acc = jax.lax.fori_loop(0, N_ITERS, body, (o0 * 0 + o, 0.0))
            return acc

        return jax.jit(run)

    def report(name, stage):
        dt = timed(chain(stage), params, o0, d0)
        print(f"{name:46s} {dt * 1e3:8.2f} ms", flush=True)

    # A. geometry-only march
    report("march (geometry only)",
           lambda prm, o, d: march_features(m, None, o, d, S).num_valid.sum()
           * 1e-14)

    # B. march + endpoint feats
    def feats_sum(prm, o, d):
        return march_features(
            m, prm["tetrahedra_field"], o, d, S
        ).feats.sum()

    report("march + endpoint feats (fwd)", feats_sum)

    # C. grad of B wrt field (adds the stream-blend bwd + HBM scatter)
    def feats_grad(prm, o, d):
        g = jax.grad(
            lambda fld: march_features(m, fld, o, d, S).feats.sum()
        )(prm["tetrahedra_field"])
        return g.sum()

    report("march + endpoint feats (fwd+bwd)", feats_grad)

    # D. + coarse sampling (fwd)
    nsamp = args.num_samples

    def coarse(prm, o, d):
        res = march_features(m, prm["tetrahedra_field"], o, d, S)
        nears, fars, first, nk, mask = ray_bounds(res)
        t = jnp.linspace(0.0, 1.0, nsamp)[None, :]
        dist = nears[:, None] + t * (fars - nears)[:, None]
        feats, smask = sample_features(res, dist, mask)
        return feats.sum()

    report("+ coarse sample_features (fwd)", coarse)

    # E. full forward
    def fwd(prm, o, d):
        out = model.get_outputs(
            prm, RayBundle(o, d), rng=key, train=True, mesh=m
        )
        return out["rgb"].sum()

    report("full forward", fwd)

    # F. full fwd+bwd
    def fwd_bwd(prm, o, d):
        tgt = jnp.zeros((args.rays, 3), jnp.float32)

        def loss(p):
            out = model.get_outputs(
                p, RayBundle(o, d), rng=key, train=True, mesh=m
            )
            return jnp.mean(jnp.square(out["rgb"] - tgt))

        g = jax.grad(loss)(prm)
        return g["tetrahedra_field"].sum()

    report("full fwd+bwd", fwd_bwd)

    # G. render_weights alone fwd+bwd at fine shapes
    dens0 = jnp.abs(jax.random.normal(key, (args.rays, 2 * nsamp + 1)))
    dl0 = jnp.full((args.rays, 2 * nsamp + 1), 0.01, jnp.float32)

    def rw(prm, o, d):
        g = jax.grad(
            lambda dn: render_weights(dn, dl0).sum()
        )(dens0 + o[0, 0] * 1e-14)
        return g.sum()

    report("render_weights fwd+bwd (fine shape)", rw)


if __name__ == "__main__":
    main()
