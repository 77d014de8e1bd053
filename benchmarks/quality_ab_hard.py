"""Flagship-vs-occupancy-off quality A/B on the HARD synthetic scene.

The smooth sphere scenes converge to ~1e-4 train loss, so flagship
levers (occupancy termination, K-bucket truncation, tuned bounds)
could regress quality invisibly. The hard scene (textured albedo +
thin occluder + view-dependent specular, ``utils/synthetic.py``) keeps
converged loss discriminative; this trains the flagship preset and an
occupancy-off control for N steps on fresh hard-scene rays and
reports the held-out PSNR delta — the round-4 verdict's acceptance
gate is |delta| < 0.1 dB at 5k steps.

Usage: python benchmarks/quality_ab_hard.py [--steps 5000]
           [--points 100000] [--rays 4096] [--only flagship|control]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_variant(name, overrides, args, eval_sets):
    import jax

    from tetranerf_tpu.geometry import build_mesh
    from tetranerf_tpu.models import TetraNerf
    from tetranerf_tpu.training import Trainer, tetranerf_preset
    from tetranerf_tpu import utils as synth

    pts, colors = synth.make_hard_scene(args.points, seed=0)
    mesh = build_mesh(pts)
    config = tetranerf_preset()
    config.model.max_intersected_triangles = 256
    for k, v in overrides.items():
        setattr(config.model, k, v)
    model = TetraNerf(config.model, mesh)
    trainer = Trainer(config, model, point_colors=colors)
    rng = np.random.default_rng(0)

    def eval_psnr():
        mses = []
        for o, d, rgb in eval_sets:
            out = trainer.render_rays(o, d)
            mses.append(np.mean((np.asarray(out["rgb"]) - rgb) ** 2))
        mse = float(np.mean(mses))
        return -10.0 * np.log10(mse + 1e-12)

    t0 = time.perf_counter()
    curve = []
    for step in range(args.steps):
        o, d = synth.sample_hard_rays(rng, args.rays)
        m = trainer.train_step(
            {"origins": o, "directions": d, "rgb": synth.hard_ray_targets(o, d)}
        )
        if (step + 1) % 1000 == 0:
            psnr = eval_psnr()
            curve.append((step + 1, round(psnr, 3)))
            print(
                f"# {name} step {step + 1} loss={float(m['loss']):.5f} "
                f"eval_psnr={psnr:.2f} bound={trainer.tuned_max_steps} "
                f"({time.perf_counter() - t0:.0f}s)",
                file=sys.stderr,
            )
    final = eval_psnr()
    return {"name": name, "final_psnr": round(final, 3), "curve": curve}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--points", type=int, default=100_000)
    p.add_argument("--rays", type=int, default=4096)
    p.add_argument("--only", default=None,
                   choices=[None, "flagship", "control"])
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tetranerf_tpu import utils as synth

    # Fixed held-out ray sets (seed disjoint from training).
    eval_rng = np.random.default_rng(999)
    eval_sets = []
    for _ in range(4):
        o, d = synth.sample_hard_rays(eval_rng, 8192)
        eval_sets.append((o, d, synth.hard_ray_targets(o, d)))

    variants = {
        "flagship": {},
        "control": {"use_occupancy_field": False, "ray_buckets": 1},
    }
    results = []
    for name, ov in variants.items():
        if args.only and name != args.only:
            continue
        results.append(run_variant(name, ov, args, eval_sets))
        print(json.dumps(results[-1]))
    if len(results) == 2:
        delta = results[0]["final_psnr"] - results[1]["final_psnr"]
        print(json.dumps({"delta_db": round(delta, 3)}))


if __name__ == "__main__":
    main()
