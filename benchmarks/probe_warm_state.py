"""Diagnose the warm-occupancy steady state: after N training steps with
the occupancy EMA active, what is the per-ray crossing distribution, what
bound did the retune pick, and where does the step time go?

Usage: python benchmarks/probe_warm_state.py [--warmup 300]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--points", type=int, default=100_000)
    p.add_argument("--rays", type=int, default=8192)
    p.add_argument("--warmup", type=int, default=300)
    p.add_argument("--skip-grid", type=int, default=0,
                   help="empty-space skip grid resolution (0 = off)")
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tetranerf_tpu.geometry import build_mesh
    from tetranerf_tpu.models import TetraNerf
    from tetranerf_tpu.ops.fused import march_features
    from tetranerf_tpu.training import Trainer, tetranerf_preset

    from tetranerf_tpu.utils import (
        make_sphere_scene,
        sample_sphere_rays,
        sphere_ray_targets,
    )

    points, colors = make_sphere_scene(args.points, seed=0)
    mesh = build_mesh(points, two_hop_table=False)
    print(f"# mesh: {mesh.num_vertices} verts, {mesh.num_cells} cells")

    config = tetranerf_preset()
    config.model.num_samples = 128
    config.model.num_fine_samples = 128
    config.model.max_intersected_triangles = 256
    config.model.use_occupancy_field = True
    config.model.skip_grid_resolution = args.skip_grid
    model = TetraNerf(config.model, mesh)
    trainer = Trainer(config, model, point_colors=colors)

    rng = np.random.default_rng(0)

    def make_batch():
        o, d = sample_sphere_rays(rng, args.rays)
        return {
            "origins": o,
            "directions": d,
            "rgb": sphere_ray_targets(o, d),
        }

    m = trainer.train_step(make_batch())
    float(m["loss"])
    print(f"# cold tuned bound: {trainer.tuned_max_steps}")
    t0 = time.perf_counter()
    for i in range(args.warmup):
        m = trainer.train_step(make_batch())
        if (i + 1) % 100 == 0:
            print(
                f"# step {i+1} loss={float(m['loss']):.4f} "
                f"bound={trainer.tuned_max_steps} "
                f"({time.perf_counter()-t0:.0f}s)"
            )
    print(f"# post-warmup tuned bound: {trainer.tuned_max_steps}")
    occ = np.asarray(trainer._occ)
    print(
        f"# occ EMA: nonzero={np.mean(occ > 0):.3f} "
        f"p50={np.percentile(occ, 50):.4f} p90={np.percentile(occ, 90):.4f} "
        f"p99={np.percentile(occ, 99):.4f} max={occ.max():.4f}"
    )

    # Crossing distribution WITH occupancy termination, warm EMA.
    cfg = model.config

    @jax.jit
    def probe(mesh_t, o, d):
        res = march_features(
            mesh_t, None, o, d, 256,
            use_occupancy=True, occ_threshold=cfg.occupancy_threshold,
        )
        return res.num_valid, res.overflow, res.hit

    batch = make_batch()
    nv, ovf, hit = probe(
        trainer.mesh_tables,
        jnp.asarray(batch["origins"]),
        jnp.asarray(batch["directions"]),
    )
    nv = np.asarray(nv)
    print(
        f"# crossings (occ ON):  p50={np.percentile(nv, 50):.0f} "
        f"p90={np.percentile(nv, 90):.0f} p99={np.percentile(nv, 99):.0f} "
        f"max={nv.max()} mean={nv.mean():.1f} "
        f"overflow={np.asarray(ovf).sum()} hit={np.asarray(hit).mean():.3f}"
    )

    @jax.jit
    def probe_cold(mesh_t, o, d):
        res = march_features(mesh_t, None, o, d, 256)
        return res.num_valid

    nv0 = np.asarray(
        probe_cold(
            trainer.mesh_tables,
            jnp.asarray(batch["origins"]),
            jnp.asarray(batch["directions"]),
        )
    )
    print(
        f"# crossings (occ OFF): p50={np.percentile(nv0, 50):.0f} "
        f"p90={np.percentile(nv0, 90):.0f} p99={np.percentile(nv0, 99):.0f} "
        f"max={nv0.max()} mean={nv0.mean():.1f}"
    )

    # Which rays are the deep tail? Look at their sphere-hit status.
    deep = nv > np.percentile(nv, 99)
    tgt = sphere_ray_targets(batch["origins"], batch["directions"])
    miss = np.all(tgt == 1.0, axis=1)
    print(
        f"# deep-tail rays (>p99): {deep.sum()}, of which analytic-miss "
        f"(grazing) = {np.mean(miss[deep]):.2f}; batch miss rate = "
        f"{miss.mean():.3f}"
    )

    # Steady-state step time at the current bound.
    batches = [make_batch() for _ in range(4)]
    for b in batches:
        trainer.train_step(b)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(20):
        m = trainer.train_step(batches[i % 4])
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 20
    print(f"# steady step: {dt*1e3:.1f} ms ({args.rays/dt:,.0f} rays/s)")


if __name__ == "__main__":
    main()
