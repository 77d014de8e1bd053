"""Occupancy-driven early termination: throughput + quality parity.

Trains on the multi-view dataset with use_occupancy_field on/off:
occupancy needs warmup (EMA updates every K steps), so steady-state
throughput is measured after an initial training phase. Reports
ms/step, rays/s, and the loss trajectory for parity.

Usage: python -u benchmarks/bench_occupancy.py --data /tmp/sphere_ds
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--rays", type=int, default=8192)
    p.add_argument("--warm-steps", type=int, default=60)
    p.add_argument("--steps", type=int, default=30)
    args = p.parse_args()

    from tetranerf_tpu.models import TetraNerf
    from tetranerf_tpu.training import Trainer, tetranerf_preset
    from tetranerf_tpu.training.cli import build_mesh_for_dataset
    from tetranerf_tpu.training.datasets import load_dataset

    ds = load_dataset(args.data, "train")
    mesh, colors = build_mesh_for_dataset(
        ds, os.path.join(args.data, "tetra.npz")
    )

    for occ in (False, True):
        rng = np.random.default_rng(0)
        batches = [ds.sample_ray_batch(rng, args.rays) for _ in range(8)]
        config = tetranerf_preset()
        config.model.max_intersected_triangles = 512
        config.model.use_occupancy_field = occ
        model = TetraNerf(config.model, mesh, num_train_images=ds.num_images)
        trainer = Trainer(config, model, point_colors=colors)
        for i in range(args.warm_steps):
            m = trainer.train_step(batches[i % len(batches)])
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(args.steps):
            m = trainer.train_step(batches[i % len(batches)])
        loss = float(m["loss"])
        dt = (time.perf_counter() - t0) / args.steps
        occ_max = (
            float(np.asarray(trainer._occ).max())
            if trainer._occ is not None
            else 0.0
        )
        print(
            f"occupancy={occ!s:5} tuned={trainer.tuned_max_steps} "
            f"{dt * 1e3:7.1f} ms/step {args.rays / dt / 1e3:6.1f}K rays/s "
            f"loss@{args.warm_steps + args.steps}={loss:.5f} "
            f"occ_max={occ_max:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
