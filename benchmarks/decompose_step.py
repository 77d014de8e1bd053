"""Decompose the full train step's cost by surgical variant subtraction.

Unlike ``bisect_backward.py`` (which builds partial graphs whose gradient
flow differs from the real step), every variant here IS the real jitted
train step with exactly one piece disabled via ``stop_gradient`` or a
config/optimizer swap. Differences against the baseline therefore
measure what that piece costs *in situ* (including the XLA fusion
context).

Variants:
  full            — baseline train step (value_and_grad + RAdam)
  fwd-only        — forward pass only, no grad/optimizer
  sgd             — optax.sgd instead of RAdam (optimizer state cost)
  no-field-grad   — stop_gradient(res.feats): kills the endpoint-feature
                    backward (the [V,64] scatter + stream transposes)
  no-mlp-grad     — stop_gradient(field_values) at the fine round: MLP
                    weight grads only via dead-input field
  no-fine         — num_fine_samples=0 (no PDF round; coarse supervised)

Usage: python benchmarks/decompose_step.py [--rays 8192]
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
    p.add_argument("--only", type=str, default="",
                   help="comma-separated variant names to run")
    args = p.parse_args()

    # Persistent compile cache: the single-core host pays minutes per
    # variant otherwise.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import optax

    from tetranerf_tpu.geometry import build_mesh
    from tetranerf_tpu.models import RayBundle, TetraNerf
    from tetranerf_tpu.training import Trainer, tetranerf_preset
    from tetranerf_tpu.training.trainer import TrainState
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
    print(f"# mesh: {mesh.num_vertices} verts, {mesh.num_cells} cells")

    config = tetranerf_preset()
    config.model.num_samples = args.num_samples
    config.model.num_fine_samples = args.num_samples
    config.model.max_intersected_triangles = args.max_steps
    model = TetraNerf(config.model, mesh)
    trainer = Trainer(config, model, point_colors=colors, auto_tune_steps=False)
    params = trainer.state.params
    tables = trainer.mesh_tables

    rng = np.random.default_rng(0)

    def make_batch():
        o, d = sample_sphere_rays(rng, args.rays)
        return (
            jnp.asarray(o),
            jnp.asarray(d),
            jnp.asarray(sphere_ray_targets(o, d)),
        )

    batches = [make_batch() for _ in range(4)]
    key = jax.random.PRNGKey(0)

    def forward(prm, o, d, n_fine=None):
        rays = RayBundle(origins=o, directions=d, camera_indices=None)
        return model.get_outputs(
            prm, rays, rng=key, train=True, mesh=tables,
            max_steps=args.max_steps,
            num_fine_samples=n_fine,
        )

    def report(name, step_fn):
        fn = jax.jit(step_fn)
        dt = benchmark(
            fn, [(params, *b) for b in batches], warmup=1, repeats=3
        )
        print(f"{name:<44}{dt * 1e3:8.2f} ms")
        return dt

    def loss_of(prm, o, d, rgb, n_fine=None, field_sg=False, mlp_only=False):
        p2 = prm
        if field_sg:
            p2 = dict(prm)
            p2["tetrahedra_field"] = jax.lax.stop_gradient(
                prm["tetrahedra_field"]
            )
        out = forward(p2, o, d, n_fine=n_fine)
        return jnp.mean(jnp.square(out["rgb"] - rgb))

    opt = trainer.optimizer
    sgd = optax.sgd(1e-3)
    sgd_state = sgd.init(params)
    opt_state = trainer.state.opt_state

    def full_step(prm, o, d, rgb):
        loss, grads = jax.value_and_grad(loss_of)(prm, o, d, rgb)
        updates, _ = opt.update(grads, opt_state, prm)
        new = optax.apply_updates(prm, updates)
        return loss, new

    def fwd_only(prm, o, d, rgb):
        return loss_of(prm, o, d, rgb)

    def grad_only(prm, o, d, rgb):
        return jax.grad(loss_of)(prm, o, d, rgb)

    def sgd_step(prm, o, d, rgb):
        loss, grads = jax.value_and_grad(loss_of)(prm, o, d, rgb)
        updates, _ = sgd.update(grads, sgd_state, prm)
        new = optax.apply_updates(prm, updates)
        return loss, new

    def no_field_grad(prm, o, d, rgb):
        return jax.grad(
            lambda q: loss_of(q, o, d, rgb, field_sg=True)
        )(prm)

    def no_fine(prm, o, d, rgb):
        loss, grads = jax.value_and_grad(
            lambda q: loss_of(q, o, d, rgb, n_fine=0)
        )(prm)
        updates, _ = opt.update(grads, opt_state, prm)
        new = optax.apply_updates(prm, updates)
        return loss, new

    variants = {
        "full": ("full step (RAdam)", full_step),
        "fwd": ("forward only", fwd_only),
        "grad": ("grad only (no optimizer)", grad_only),
        "sgd": ("full step (SGD)", sgd_step),
        "nofield": ("grad, field frozen (no scatter bwd)", no_field_grad),
        "nofine": ("full step, num_fine_samples=0", no_fine),
    }
    names = [n for n in args.only.split(",") if n] or list(variants)
    for n in names:
        label, fn = variants[n]
        report(label, fn)


if __name__ == "__main__":
    main()
