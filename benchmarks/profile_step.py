"""Component-level timing of the training step on real hardware.

Breaks the step into its pipeline stages and times each with pipelined
dispatch (``utils/profiling.benchmark``) so tunnel latency doesn't skew
results. Used to direct the round-2 optimization work (VERDICT item 1a).

Usage: python benchmarks/profile_step.py [--rays 4096] [--max-steps 256]
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
    p.add_argument("--rays", type=int, default=4096)
    p.add_argument("--max-steps", type=int, default=256)
    p.add_argument("--num-samples", type=int, default=128)
    p.add_argument("--batches", type=int, default=8)
    args = p.parse_args()

    from tetranerf_tpu.geometry import build_mesh
    from tetranerf_tpu.models import RayBundle, TetraNerf
    from tetranerf_tpu.ops.fused import march_features, ray_bounds, sample_features
    from tetranerf_tpu.training import Trainer, tetranerf_preset
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
    S = args.max_steps

    rng = np.random.default_rng(0)

    def make_rays():
        o, d = sample_sphere_rays(rng, args.rays)
        return jnp.asarray(o), jnp.asarray(d)

    ray_sets = [make_rays() for _ in range(args.batches)]

    def report(name, fn, args_list):
        dt = benchmark(fn, args_list, warmup=2, repeats=3)
        print(f"{name:44s} {dt * 1e3:8.2f} ms")
        return dt

    m = trainer.mesh_tables

    # 1. geometry-only march
    f = jax.jit(lambda o, d: march_features(m, None, o, d, S).num_valid)
    report("march (geometry only)", f, ray_sets)

    # 2. march + endpoint features
    f = jax.jit(
        lambda fld, o, d: march_features(m, fld, o, d, S).feats.sum()
    )
    fld = params["tetrahedra_field"]
    report("march + endpoint feats (fwd)", f, [(fld, *r) for r in ray_sets])

    # 3. endpoint feature gather fwd+bwd (the interpolation VJP scatter)
    def feat_loss(fld, o, d):
        return march_features(m, fld, o, d, S).feats.sum()

    f = jax.jit(jax.grad(feat_loss))
    report("march + endpoint feats (fwd+bwd)", f, [(fld, *r) for r in ray_sets])

    # 4. sample_features on top (fwd)
    nsamp = args.num_samples

    def sample_path(fld, o, d):
        res = march_features(m, fld, o, d, S)
        nears, fars, first, nk, mask = ray_bounds(res)
        t = jnp.linspace(0.0, 1.0, nsamp)[None, :]
        dist = nears[:, None] + t * (fars - nears)[:, None]
        feats, smask = sample_features(res, dist, mask)
        return feats.sum()

    f = jax.jit(sample_path)
    report("march+feats+sample_features (fwd)", f, [(fld, *r) for r in ray_sets])
    f = jax.jit(jax.grad(sample_path))
    report("march+feats+sample_features (fwd+bwd)", f, [(fld, *r) for r in ray_sets])

    # 5. full forward
    def fwd(prm, o, d):
        out = model.get_outputs(
            prm, RayBundle(origins=o, directions=d),
            rng=jax.random.PRNGKey(0), train=True, mesh=m,
        )
        return out["rgb"].sum()

    f = jax.jit(fwd)
    report("full forward", f, [(params, *r) for r in ray_sets])

    # 6. full forward + backward
    f = jax.jit(lambda prm, o, d: jax.grad(fwd)(prm, o, d)["tetrahedra_field"].sum())
    report("full forward+backward", f, [(params, *r) for r in ray_sets])

    # 7. full train step
    batches = []
    for o, d in ray_sets:
        on, dn = np.asarray(o), np.asarray(d)
        batches.append({
            "origins": on, "directions": dn,
            "rgb": sphere_ray_targets(on, dn),
        })
    st = [None]

    def step(b):
        return trainer.train_step(b)["loss"]

    # warmup + timing through the trainer (keeps donation semantics).
    # float(last) fetches the final loss — a scalar that depends on the
    # whole chained state — because block_until_ready returns early on
    # tunneled devices.
    import time
    for b in batches[:2]:
        float(step(b))
    t0 = time.perf_counter()
    n = 0
    for _ in range(3):
        for b in batches:
            last = step(b)
            n += 1
    float(last)
    dt = (time.perf_counter() - t0) / n
    print(f"{'full train step':44s} {dt * 1e3:8.2f} ms")
    print(f"# rays/s at {args.rays} rays: {args.rays / dt:,.0f}")


if __name__ == "__main__":
    main()
