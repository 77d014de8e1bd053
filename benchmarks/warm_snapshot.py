"""Warm the flagship trainer to its steady state ONCE and snapshot it.

The occupancy EMA takes ~1300 bench-scene steps (~2-4 min on chip) to
collapse the crossing distribution; every warm-state experiment paying
that again makes profiling iteration impossibly slow. This script runs
the exact bench.py warmup (stability-exit included) and saves:

- the orbax checkpoint (params / opt state / step) + ``occupancy.npy``
- ``warm_meta.json``: tuned bounds, bucket bounds, occ depth cap, scene

``benchmarks/profile_warm_buckets.py`` restores all of it in seconds.

Usage: python benchmarks/warm_snapshot.py [--out /tmp/warm_sphere]
           [--scene sphere|camera] [--warmup-steps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_trainer(scene: str, points: int, overrides=None):
    """Scene + flagship trainer exactly as bench.py constructs them."""
    import jax

    from tetranerf_tpu.geometry import build_mesh
    from tetranerf_tpu.models import TetraNerf
    from tetranerf_tpu.training import Trainer, tetranerf_preset
    from tetranerf_tpu import utils as synth

    if scene == "camera":
        make_scene = synth.make_camera_scene
        sample_rays = synth.sample_camera_rays
        ray_targets = synth.camera_ray_targets
    elif scene == "hard":
        make_scene = synth.make_hard_scene
        sample_rays = synth.sample_hard_rays
        ray_targets = synth.hard_ray_targets
    else:
        make_scene = synth.make_sphere_scene
        sample_rays = synth.sample_sphere_rays
        ray_targets = synth.sphere_ray_targets

    t0 = time.perf_counter()
    pts, colors = make_scene(points, seed=0)
    mesh = build_mesh(
        pts,
        two_hop_table=(overrides or {}).get("traversal_hops") == 2,
    )
    print(
        f"# mesh: {mesh.num_vertices} verts, {mesh.num_cells} cells "
        f"({time.perf_counter() - t0:.1f}s) on {jax.devices()[0].platform}",
        file=sys.stderr,
    )
    config = tetranerf_preset()
    config.model.num_samples = 128
    config.model.num_fine_samples = 128
    config.model.max_intersected_triangles = 256
    for k, v in (overrides or {}).items():
        setattr(config.model, k, v)
    model = TetraNerf(config.model, mesh)
    trainer = Trainer(config, model, point_colors=colors)
    return trainer, sample_rays, ray_targets


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/warm_sphere")
    p.add_argument(
        "--scene", default="sphere", choices=["sphere", "camera", "hard"]
    )
    p.add_argument("--points", type=int, default=100_000)
    p.add_argument("--rays", type=int, default=8192)
    p.add_argument("--warmup-steps", type=int, default=2600)
    p.add_argument("--min-warmup", type=int, default=512)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    trainer, sample_rays, ray_targets = build_trainer(args.scene, args.points)
    config = trainer.config
    rng = np.random.default_rng(0)

    def make_batch():
        o, d = sample_rays(rng, args.rays)
        return {"origins": o, "directions": d, "rgb": ray_targets(o, d)}

    m = trainer.train_step(make_batch())
    float(m["loss"])
    retune_every = config.model.occupancy_retune_every or 128
    bound_history = []
    for i in range(args.warmup_steps):
        m = trainer.train_step(make_batch())
        if (i + 1) % 100 == 0:
            print(
                f"# warm {i + 1} loss={float(m['loss']):.4f} "
                f"bound={trainer.tuned_max_steps} "
                f"buckets={trainer.tuned_bucket_steps}",
                file=sys.stderr,
            )
        if (i + 1) % retune_every == 0:
            bound_history.append(
                (trainer.tuned_max_steps, trainer.tuned_bucket_steps)
            )
            stable = lambda n: (
                len(bound_history) >= n and len(set(bound_history[-n:])) == 1
            )
            retuned = (
                bound_history[-1][0] is not None
                or bound_history[-1][1] is not None
            )
            if (i + 1 >= args.min_warmup and retuned and stable(3)) or (
                i + 1 >= 1536 and stable(6)
            ):
                break

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    trainer.save_checkpoint(out)
    meta = {
        "scene": args.scene,
        "points": args.points,
        "rays": args.rays,
        "tuned_max_steps": trainer.tuned_max_steps,
        "tuned_bucket_steps": trainer.tuned_bucket_steps,
        "occ_cap": trainer._occ_cap,
        "warm_steps": i + 1,
        "loss": float(m["loss"]),
    }
    with open(os.path.join(out, "warm_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"# snapshot -> {out}: {meta}", file=sys.stderr)


def restore_trainer(path: str, overrides=None, rays=None):
    """Rebuild scene + trainer from a snapshot directory (seconds, not
    minutes). Returns ``(trainer, make_batch)`` in the snapshot's warm
    state: params, occupancy EMA/column, tuned bounds, depth cap.

    ``overrides`` tweak model-config fields BEFORE the trainer builds
    its jitted steps (e.g. ``{"interp_mode": "matmul"}``) — the warm
    state is config-independent (params + EMA + bounds), so variants
    restored this way are directly comparable."""
    import jax
    import jax.numpy as jnp

    with open(os.path.join(path, "warm_meta.json")) as f:
        meta = json.load(f)
    trainer, sample_rays, ray_targets = build_trainer(
        meta["scene"], meta["points"], overrides
    )
    trainer.restore_checkpoint(path)
    trainer._tuned = True  # skip the cold probe
    trainer.tuned_max_steps = meta["tuned_max_steps"]
    bs = meta["tuned_bucket_steps"]
    k = trainer.model.config.ray_buckets
    if bs and len(bs) != max(k - 1, 0):
        # Snapshot tuned at a different ray_buckets: its inner-bound
        # tuple cannot drive this K (pair the override with
        # profile_warm --recalibrate to re-derive K-1 bounds).
        bs = None
    trainer.tuned_bucket_steps = tuple(bs) if bs else None
    trainer._occ_cap = meta["occ_cap"]
    trainer._occ_cap_dev = jax.device_put(
        jnp.float32(meta["occ_cap"]), trainer._rep
    )
    trainer._build_steps()
    rng = np.random.default_rng(0)
    rays = rays or meta["rays"]

    def make_batch():
        o, d = sample_rays(rng, rays)
        return {"origins": o, "directions": d, "rgb": ray_targets(o, d)}

    return trainer, make_batch


if __name__ == "__main__":
    main()
