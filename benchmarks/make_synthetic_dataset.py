"""Generate a Blender-format multi-view dataset of the analytic sphere.

Produces transforms_{train,test}.json + PNG images rendered from the
analytic ground truth (``sphere_ray_targets``) and a tetrahedra file
from the matching point cloud — a fully self-contained scene for
end-to-end quality runs through the real dataset/CLI path (no external
datasets are mounted in this environment).

Usage: python benchmarks/make_synthetic_dataset.py --out /tmp/sphere_ds \
           [--side 256] [--train 40] [--test 8] [--points 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def look_at(pos):
    forward = -pos / np.linalg.norm(pos)
    upw = np.array([0.0, 0.0, 1.0])
    if abs(forward @ upw) > 0.98:
        upw = np.array([0.0, 1.0, 0.0])
    right = np.cross(forward, upw)
    right /= np.linalg.norm(right)
    up = np.cross(right, forward)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -forward, pos
    return c2w


def camera_rays(c2w, side, camera_angle_x):
    focal = 0.5 * side / np.tan(0.5 * camera_angle_x)
    j, i = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    dirs = np.stack(
        [
            (i - side / 2 + 0.5) / focal,
            -(j - side / 2 + 0.5) / focal,
            -np.ones_like(i, np.float64),
        ],
        axis=-1,
    )
    d = dirs @ c2w[:3, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(c2w[:3, 3], d.shape)
    return o.reshape(-1, 3), d.reshape(-1, 3)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--side", type=int, default=256)
    p.add_argument("--train", type=int, default=40)
    p.add_argument("--test", type=int, default=8)
    p.add_argument("--points", type=int, default=100_000)
    p.add_argument("--radius", type=float, default=2.5)
    p.add_argument(
        "--scene", default="sphere", choices=["sphere", "hard"],
        help="'hard' = textured spheres + thin occluder + view-dependent "
        "shading (the discriminative quality benchmark)",
    )
    args = p.parse_args()

    from PIL import Image

    from tetranerf_tpu import utils as synth
    from tetranerf_tpu.geometry import save_tetrahedra, triangulate

    if args.scene == "hard":
        make_scene, ray_targets = synth.make_hard_scene, synth.hard_ray_targets
    else:
        make_scene, ray_targets = (
            synth.make_sphere_scene,
            synth.sphere_ray_targets,
        )

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(0)
    camera_angle_x = 0.8

    def make_split(split, count, offset):
        frames = []
        for k in range(count):
            # Fibonacci-ish shell placement, jittered per split.
            z = 1 - 2 * (k + 0.5) / count
            phi = (k + offset) * 2.399963 + offset
            r = np.sqrt(max(1 - z * z, 1e-6))
            pos = args.radius * np.array(
                [r * np.cos(phi), r * np.sin(phi), z * 0.8]
            )
            c2w = look_at(pos)
            o, d = camera_rays(c2w, args.side, camera_angle_x)
            rgb = ray_targets(o, d).reshape(args.side, args.side, 3)
            name = f"{split}_{k:03d}"
            Image.fromarray(
                (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
            ).save(os.path.join(args.out, f"{name}.png"))
            frames.append(
                {
                    "file_path": f"./{name}",
                    "transform_matrix": c2w.tolist(),
                }
            )
        with open(
            os.path.join(args.out, f"transforms_{split}.json"), "w"
        ) as f:
            json.dump(
                {"camera_angle_x": camera_angle_x, "frames": frames}, f
            )

    make_split("train", args.train, 0.0)
    make_split("test", args.test, 0.37)

    points, colors = make_scene(args.points, seed=0)
    cells = triangulate(points)
    save_tetrahedra(
        os.path.join(args.out, "tetra.npz"),
        vertices=points,
        cells=cells,
        colors=colors,
    )
    print(
        f"dataset at {args.out}: {args.train} train / {args.test} test "
        f"@ {args.side}^2, {len(points)} points / {len(cells)} cells"
    )


if __name__ == "__main__":
    main()
