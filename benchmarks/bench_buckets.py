"""K-bucket quantile traversal on REAL camera-ray distributions.

Round-1 measured bucketing ~neutral on the synthetic random-shell rays
(near-uniform hull chords). Camera rays from the multi-view dataset
have the mixed near/far chord distribution bucketing targets. Requires
a dataset from benchmarks/make_synthetic_dataset.py.

Usage: python -u benchmarks/bench_buckets.py --data /tmp/sphere_ds \
           [--buckets 1 2 4 8]
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
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--buckets", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--adaptive", default="true", choices=["true", "false"],
                   help="bucket_adaptive_samples")
    args = p.parse_args()

    from tetranerf_tpu.models import TetraNerf
    from tetranerf_tpu.training import Trainer, tetranerf_preset
    from tetranerf_tpu.training.cli import build_mesh_for_dataset
    from tetranerf_tpu.training.datasets import load_dataset

    ds = load_dataset(args.data, "train")
    mesh, colors = build_mesh_for_dataset(
        ds, os.path.join(args.data, "tetra.npz")
    )
    rng = np.random.default_rng(0)
    batches = [ds.sample_ray_batch(rng, args.rays) for _ in range(4)]

    for buckets in args.buckets:
        config = tetranerf_preset()
        config.model.max_intersected_triangles = 512
        config.model.ray_buckets = buckets
        config.model.bucket_adaptive_samples = args.adaptive == "true"
        model = TetraNerf(config.model, mesh, num_train_images=ds.num_images)
        trainer = Trainer(config, model, point_colors=colors)
        m = trainer.train_step(batches[0])
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(args.steps):
            m = trainer.train_step(batches[i % len(batches)])
        loss = float(m["loss"])
        dt = (time.perf_counter() - t0) / args.steps
        print(
            f"buckets={buckets} tuned={trainer.tuned_max_steps} "
            f"bucket_bounds={trainer.tuned_bucket_steps} "
            f"{dt * 1e3:7.1f} ms/step "
            f"{args.rays / dt / 1e3:6.1f}K rays/s loss={loss:.5f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
