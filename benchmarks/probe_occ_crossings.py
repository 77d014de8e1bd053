"""What does the trained occupancy EMA do to per-ray crossing counts?

Trains the bench scene with ``use_occupancy_field`` for N steps, then
probes the march with termination active: crossing-count percentiles,
the occupancy histogram, and the march time. Decides whether the
steady-state traversal bound can be retuned down (shrinking every
[R, T]-shaped stage of the step, not just the march).

Usage: python benchmarks/probe_occ_crossings.py [--warm-steps 400]
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
    p.add_argument("--warm-steps", type=int, default=400)
    p.add_argument("--occ-threshold", type=float, default=None)
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
    from tetranerf_tpu.utils.profiling import benchmark

    points, colors = make_sphere_scene(args.points, seed=0)
    mesh = build_mesh(points, two_hop_table=False)

    config = tetranerf_preset()
    config.model.max_intersected_triangles = 256
    config.model.use_occupancy_field = True
    if args.occ_threshold is not None:
        config.model.occupancy_threshold = args.occ_threshold
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
    for i in range(args.warm_steps):
        m = trainer.train_step(make_batch())
        if (i + 1) % 100 == 0:
            print(f"step {i+1} loss={float(m['loss']):.5f}", file=sys.stderr)

    occ = np.asarray(trainer._occ)
    nz = occ[occ > 0]
    print(f"occupancy: {len(nz)} / {len(occ)} cells nonzero")
    if len(nz):
        print(
            "  occ>0 percentiles p50/p90/p99/max:",
            [round(float(np.percentile(nz, q)), 3) for q in (50, 90, 99)],
            round(float(nz.max()), 3),
        )

    tuned = trainer.tuned_max_steps or 256
    cfg = trainer.model.config

    def probe(mm, oo, dd, use_occ):
        return march_features(
            mm, None, oo, dd, tuned,
            use_occupancy=use_occ,
            occ_threshold=cfg.occupancy_threshold,
            compact_stages=cfg.march_compaction,
        ).num_valid

    def probe_thr(mm, oo, dd, thr):
        return march_features(
            mm, None, oo, dd, tuned,
            use_occupancy=True,
            occ_threshold=thr,
            compact_stages=cfg.march_compaction,
        ).num_valid

    batches = []
    for _ in range(4):
        o, d = sample_sphere_rays(rng, args.rays)
        batches.append(
            (trainer.mesh_tables, jnp.asarray(o), jnp.asarray(d))
        )

    cases = [("occ off", jax.jit(lambda mm, oo, dd: probe(mm, oo, dd, False)))]
    for thr in (1e-2, 1e-3, 1e-4, 1e-5):
        cases.append(
            (f"thr {thr:g}",
             jax.jit(lambda mm, oo, dd, t=thr: probe_thr(mm, oo, dd, t)))
        )
    for name, fn in cases:
        ms = benchmark(fn, batches) * 1e3
        nv = np.concatenate([np.asarray(fn(*b)) for b in batches])
        print(
            f"march {name:9s} (bound {tuned}): {ms:6.2f} ms  "
            f"crossings p50={np.percentile(nv, 50):.0f} "
            f"p90={np.percentile(nv, 90):.0f} "
            f"p99={np.percentile(nv, 99):.0f} max={nv.max()}"
        )


if __name__ == "__main__":
    main()
