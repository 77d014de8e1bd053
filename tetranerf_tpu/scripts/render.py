"""Render CLI: images (RGB / depth / accumulation) from a checkpoint.

The reference delegates rendering/eval to nerfstudio's viewer and
``ns-eval`` which drive the same per-chunk forward pass (SURVEY §3.5);
this is the standalone equivalent, with per-image metrics.

Usage::

    python -m tetranerf_tpu.scripts.render \
        --checkpoint outputs/scene/final --data data/scene \
        [--tetrahedra-path tetra.th] [--split test] [--output renders/]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(prog="tetranerf-render")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--data", required=True)
    parser.add_argument("--tetrahedra-path", default=None)
    parser.add_argument("--split", default="test")
    parser.add_argument("--output", default="renders")
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--method", default="tetra-nerf")
    parser.add_argument("--chunk", type=int, default=16384)
    parser.add_argument(
        "--fast", action="store_true",
        help="coarse-only render with 64 samples (viewer-speed mode)",
    )
    args = parser.parse_args(argv)

    from PIL import Image

    from ..models import TetraNerf
    from ..training.cli import build_mesh_for_dataset
    from ..training.datasets import load_dataset
    from ..training.metrics import compute_image_metrics
    from ..training.presets import METHODS
    from ..training.trainer import Trainer

    ckpt_dir = Path(args.checkpoint)
    config = METHODS[args.method]()
    cfg_file = ckpt_dir / "train_config.json"
    if cfg_file.exists():
        with open(cfg_file) as f:
            saved = json.load(f)
        for k, v in saved.get("model", {}).items():
            if (
                hasattr(config.model, k)
                and isinstance(v, (int, float, str, bool))
                and k != "tetrahedra_path"
            ):
                setattr(config.model, k, v)

    dataset = load_dataset(args.data, args.split)
    mesh, colors = build_mesh_for_dataset(
        dataset,
        args.tetrahedra_path,
        two_hop_table=config.model.traversal_hops == 2,
    )
    model = TetraNerf(config.model, mesh, num_train_images=dataset.num_images)
    trainer = Trainer(config, model, point_colors=colors, auto_tune_steps=False)
    trainer.restore_checkpoint(str(ckpt_dir))

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    num = dataset.num_images
    if args.max_images:
        num = min(num, args.max_images)
    metrics_all = []
    t_start = time.perf_counter()
    total_rays = 0
    for i in range(num):
        o, d = dataset.camera_rays(i)
        total_rays += len(o)
        out = trainer.render_rays(
            o, d, chunk=args.chunk,
            num_samples=64 if args.fast else None,
            num_fine_samples=0 if args.fast else None,
        )
        h, w = dataset.height, dataset.width
        rgb = np.clip(out["rgb"].reshape(h, w, 3), 0, 1)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            out_dir / f"{args.split}_{i:04d}.png"
        )
        depth = out["depth"].reshape(h, w)
        finite = depth[np.isfinite(depth)]
        dmax = finite.max() if len(finite) else 1.0
        depth_img = np.clip(depth / max(dmax, 1e-6), 0, 1)
        Image.fromarray((depth_img * 255).astype(np.uint8)).save(
            out_dir / f"{args.split}_{i:04d}_depth.png"
        )
        m = compute_image_metrics(rgb, dataset.images[i])
        metrics_all.append(m)
        print(f"image {i}: psnr={m['psnr']:.2f}", file=sys.stderr)
    dt = time.perf_counter() - t_start
    mean = {
        k: float(np.mean([m[k] for m in metrics_all])) for k in metrics_all[0]
    }
    mean["render_rays_per_sec"] = total_rays / dt
    print(json.dumps(mean))
    with open(out_dir / "metrics.json", "w") as f:
        json.dump(mean, f, indent=2)


def entrypoint():
    main()


if __name__ == "__main__":
    main()
