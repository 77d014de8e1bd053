"""End-to-end CLI test: tiny Blender-format scene, 20 training steps."""

import json

import numpy as np
import pytest

from tetranerf_tpu.geometry import save_tetrahedra, triangulate
from tetranerf_tpu.training.cli import main as train_main
from tetranerf_tpu.utils import make_sphere_scene


@pytest.fixture()
def tiny_scene_dir(tmp_path, rng):
    from PIL import Image

    frames = []
    for i in range(4):
        ang = i * np.pi / 2
        pos = np.array([2.5 * np.cos(ang), 2.5 * np.sin(ang), 0.8])
        forward = -pos / np.linalg.norm(pos)
        right = np.cross(forward, [0.0, 0, 1])
        right /= np.linalg.norm(right)
        up = np.cross(right, forward)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -forward, pos
        img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        Image.fromarray(img).save(tmp_path / f"r_{i}.png")
        frames.append(
            {"file_path": f"./r_{i}", "transform_matrix": c2w.tolist()}
        )
    for split in ("train", "test"):
        with open(tmp_path / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    # Tetrahedra file from a synthetic sphere cloud.
    points, colors = make_sphere_scene(400, seed=2)
    cells = triangulate(points)
    save_tetrahedra(
        tmp_path / "tetra.npz",
        vertices=points,
        cells=cells,
        colors=colors,
    )
    return tmp_path


def test_train_cli_end_to_end(tiny_scene_dir, tmp_path):
    out_dir = tmp_path / "out"
    train_main(
        [
            "--data", str(tiny_scene_dir),
            "--tetrahedra-path", str(tiny_scene_dir / "tetra.npz"),
            "--output-dir", str(out_dir),
            "--max-num-iterations", "20",
            "--rays-per-batch", "128",
            "--num-samples", "8",
            "--num-fine-samples", "8",
            "--max-intersected-triangles", "48",
            "--field-dim", "8",
        ]
    )
    with open(out_dir / "eval_metrics.json") as f:
        metrics = json.load(f)
    assert "psnr" in metrics and np.isfinite(metrics["psnr"])
    assert "mipnerf_ssim" in metrics
    assert (out_dir / "final" / "train_config.json").exists()

    # Render from the saved checkpoint.
    from tetranerf_tpu.scripts.render import main as render_main

    render_dir = tmp_path / "renders"
    render_main(
        [
            "--checkpoint", str(out_dir / "final"),
            "--data", str(tiny_scene_dir),
            "--tetrahedra-path", str(tiny_scene_dir / "tetra.npz"),
            "--split", "test",
            "--output", str(render_dir),
            "--max-images", "2",
        ]
    )
    assert (render_dir / "test_0000.png").exists()
    assert (render_dir / "test_0000_depth.png").exists()
    with open(render_dir / "metrics.json") as f:
        rm = json.load(f)
    assert np.isfinite(rm["psnr"]) and rm["render_rays_per_sec"] > 0


def test_train_cli_config_flags(tiny_scene_dir, tmp_path):
    """The named tuned-knob aliases AND the generic --model.* surface
    reach the model config (the reference's --pipeline.model.* parity,
    README.md:106-115); final metrics are tagged with the eval split."""
    out_dir = tmp_path / "out2"
    trainer = train_main(
        [
            "--data", str(tiny_scene_dir),
            "--tetrahedra-path", str(tiny_scene_dir / "tetra.npz"),
            "--output-dir", str(out_dir),
            "--max-num-iterations", "4",
            "--rays-per-batch", "64",
            "--num-samples", "8",
            "--num-fine-samples", "0",
            "--max-intersected-triangles", "48",
            "--field-dim", "8",
            # named aliases
            "--ray-buckets", "2",
            "--occupancy-threshold", "0.001",
            "--interp-mode", "matmul",
            "--retune-percentile", "95",
            # generic --model.* surface
            "--model.hidden-size", "16",
            "--model.occupancy-decay", "0.9",
            "--model.bucket-adaptive-samples", "false",
            "--model.depth-method", "expected",
        ]
    )
    cfg = trainer.model.config
    assert cfg.ray_buckets == 2
    assert cfg.occupancy_threshold == 0.001
    assert cfg.interp_mode == "matmul"
    assert cfg.occupancy_retune_percentile == 95.0
    assert cfg.hidden_size == 16
    assert cfg.occupancy_decay == 0.9
    assert cfg.bucket_adaptive_samples is False
    assert cfg.depth_method == "expected"
    with open(out_dir / "eval_metrics.json") as f:
        metrics = json.load(f)
    assert metrics["eval_split"] == "test"


def test_train_cli_missing_test_split(tiny_scene_dir, tmp_path):
    """A missing test split aborts unless --allow-eval-on-train, which
    warns and tags the metrics eval_split='train'."""
    (tiny_scene_dir / "transforms_test.json").unlink()
    common = [
        "--data", str(tiny_scene_dir),
        "--tetrahedra-path", str(tiny_scene_dir / "tetra.npz"),
        "--max-num-iterations", "2",
        "--rays-per-batch", "64",
        "--num-samples", "8",
        "--num-fine-samples", "0",
        "--max-intersected-triangles", "48",
        "--field-dim", "8",
    ]
    with pytest.raises(SystemExit, match="allow-eval-on-train"):
        train_main(common + ["--output-dir", str(tmp_path / "out3")])
    out_dir = tmp_path / "out4"
    train_main(
        common
        + ["--output-dir", str(out_dir), "--allow-eval-on-train"]
    )
    with open(out_dir / "eval_metrics.json") as f:
        metrics = json.load(f)
    assert metrics["eval_split"] == "train"
