"""Viewer CLI: serve the interactive orbit viewer for a checkpoint.

Usage::

    python -m tetranerf_tpu.scripts.viewer \
        --checkpoint outputs/scene/final --data data/scene \
        [--tetrahedra-path tetra.th] [--port 7007]

Open http://localhost:7007 — drag to orbit, wheel to dolly; frames
refine to full quality when the camera holds still (cached-march
re-shading; see ``tetranerf_tpu.viewer``).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser(prog="tetranerf-viewer")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--data", required=True)
    parser.add_argument("--tetrahedra-path", default=None)
    parser.add_argument("--method", default="tetra-nerf")
    parser.add_argument("--port", type=int, default=7007)
    args = parser.parse_args(argv)

    from ..models import TetraNerf
    from ..training.cli import build_mesh_for_dataset
    from ..training.datasets import load_dataset
    from ..training.presets import METHODS
    from ..training.trainer import Trainer
    from ..viewer import ViewerServer

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

    dataset = load_dataset(args.data, "train")
    mesh, colors = build_mesh_for_dataset(
        dataset,
        args.tetrahedra_path,
        two_hop_table=config.model.traversal_hops == 2,
    )
    model = TetraNerf(config.model, mesh, num_train_images=dataset.num_images)
    trainer = Trainer(config, model, point_colors=colors, auto_tune_steps=False)
    trainer.restore_checkpoint(str(ckpt_dir))

    print(f"viewer at http://localhost:{args.port}", file=sys.stderr)
    ViewerServer(trainer, port=args.port).start(background=False)


def entrypoint():
    main()


if __name__ == "__main__":
    main()
