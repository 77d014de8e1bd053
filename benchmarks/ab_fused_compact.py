"""A/B the fused Pallas MLP stack and march compaction on real hardware.

Four configs x 20 steps at 8192 rays, one process (mesh built once).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tetranerf_tpu.geometry import build_mesh
    from tetranerf_tpu.models import TetraNerf
    from tetranerf_tpu.training import Trainer, tetranerf_preset
    from tetranerf_tpu.utils import (
        make_sphere_scene,
        sample_sphere_rays,
        sphere_ray_targets,
    )

    t0 = time.perf_counter()
    points, colors = make_sphere_scene(100_000, seed=0)
    mesh = build_mesh(points, two_hop_table=False)
    # On device once: jitted closures over a numpy mesh would embed
    # the tables as HLO constants.
    mesh = jax.device_put(mesh)
    print(f"# mesh built in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    batches = []
    for _ in range(4):
        o, d = sample_sphere_rays(rng, 8192)
        batches.append(
            {"origins": o, "directions": d, "rgb": sphere_ray_targets(o, d)}
        )

    for fused in (True, False):
        for compact in (2, 0):
            config = tetranerf_preset()
            config.model.num_samples = 128
            config.model.num_fine_samples = 128
            config.model.max_intersected_triangles = 256
            config.model.fused_mlps = fused
            config.model.march_compaction = compact
            model = TetraNerf(config.model, mesh)
            trainer = Trainer(config, model, point_colors=colors)
            m = trainer.train_step(batches[0])
            float(m["loss"])
            t0 = time.perf_counter()
            for i in range(20):
                m = trainer.train_step(batches[i % 4])
            loss = float(m["loss"])
            dt = (time.perf_counter() - t0) / 20
            print(
                f"fused={fused!s:5} compact={compact}  {dt * 1e3:7.1f} ms/step"
                f"  {8192 / dt / 1e3:6.1f}K rays/s  loss={loss:.4f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
