"""Preprocessing CLI tests (no colmap binary required)."""

import json

import numpy as np
import pytest

from tetranerf_tpu.geometry import load_tetrahedra, write_ply
from tetranerf_tpu.scripts import common as script_common
from tetranerf_tpu.scripts.process_blender import blender_to_colmap
from tetranerf_tpu.scripts.process_tanksandtemples import read_nsvf
from tetranerf_tpu.scripts.triangulate import main as triangulate_main
from tetranerf_tpu.utils import colmap as cm


def test_triangulate_cli(tmp_path, ball_points, rng):
    colors = rng.integers(0, 255, size=(len(ball_points), 3), dtype=np.uint8)
    ply = tmp_path / "cloud.ply"
    write_ply(ply, ball_points, colors)
    out = tmp_path / "tetra.npz"
    triangulate_main(
        [
            "--pointcloud", str(ply),
            "--output", str(out),
            "--random-points-ratio", "0.5",
        ]
    )
    data = load_tetrahedra(out)
    assert len(data["vertices"]) == int(len(ball_points) * 1.5)
    assert data["cells"].max() == len(data["vertices"]) - 1
    assert data["colors"].shape == (len(data["vertices"]), 4)
    # Jittered extra points get neutral gray.
    assert (data["colors"][len(ball_points):, :3] == 128).all()


def test_triangulate_cli_subsample(tmp_path, ball_points):
    ply = tmp_path / "cloud.ply"
    write_ply(ply, ball_points)
    out = tmp_path / "tetra.npz"
    triangulate_main(
        [
            "--pointcloud", str(ply),
            "--output", str(out),
            "--max-pointcloud-size", "200",
        ]
    )
    data = load_tetrahedra(out)
    assert len(data["vertices"]) == 200


def test_blender_to_colmap(tmp_path, rng):
    # Build a tiny blender dir.
    from PIL import Image

    (tmp_path / "train").mkdir()
    frames = []
    for i in range(3):
        c2w = np.eye(4)
        c2w[:3, 3] = [i, 0, 4]
        Image.fromarray(
            rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        ).save(tmp_path / "train" / f"r_{i}.png")
        frames.append(
            {"file_path": f"./train/r_{i}", "transform_matrix": c2w.tolist()}
        )
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.69, "frames": frames}, f)

    cameras, images = blender_to_colmap(tmp_path, "train")
    assert cameras[1].model == "PINHOLE"
    assert cameras[1].width == 8
    assert len(images) == 3
    # Round trip: COLMAP w2c back to OpenGL c2w must equal the input.
    im = images[1]
    w2c = im.world_to_camera()
    c2w = np.linalg.inv(w2c)
    c2w[:3, 1:3] *= -1
    np.testing.assert_allclose(c2w[:3, 3], [0, 0, 4], atol=1e-9)
    np.testing.assert_allclose(c2w[:3, :3], np.eye(3), atol=1e-9)


def test_read_nsvf(tmp_path, rng):
    from PIL import Image

    (tmp_path / "rgb").mkdir()
    (tmp_path / "pose").mkdir()
    np.savetxt(
        tmp_path / "intrinsics.txt",
        np.array([[100.0, 0, 4, 0], [0, 100.0, 4, 0], [0, 0, 1, 0], [0, 0, 0, 1]]),
    )
    for i, prefix in enumerate(["0_a", "0_b", "1_c"]):
        Image.fromarray(
            rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        ).save(tmp_path / "rgb" / f"{prefix}.png")
        pose = np.eye(4)
        pose[:3, 3] = [0, 0, i + 1]
        np.savetxt(tmp_path / "pose" / f"{prefix}.txt", pose)
    intr, entries = read_nsvf(tmp_path)
    assert intr["fx"] == 100.0
    assert len(entries) == 3
    splits = [e[2] for e in entries]
    assert splits.count("train") == 2 and splits.count("test") == 1


def test_export_minimal_npz_roundtrip(tmp_path, rng):
    from tetranerf_tpu.training.datasets import load_minimal_npz
    from PIL import Image

    names = []
    for i in range(9):
        p = tmp_path / f"im_{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        ).save(p)
        names.append(str(p))
    c2ws = np.tile(np.eye(4)[:3], (9, 1, 1))
    transform = np.eye(4)[:3]
    script_common.export_minimal_npz(
        tmp_path,
        names,
        c2ws,
        {"fx": 10.0, "fy": 10.0, "cx": 4.0, "cy": 4.0},
        8,
        8,
        applied_transform=transform,
        applied_scale=0.5,
    )
    train = load_minimal_npz(tmp_path / "train.npz")
    test = load_minimal_npz(tmp_path / "test.npz")
    assert train.num_images == 7  # every-8th held out: indices 0 and 8
    assert test.num_images == 2
    assert train.dataparser_scale == 0.5


def test_colmap_database(tmp_path):
    import sqlite3

    cameras = {1: cm.Camera(1, "PINHOLE", 8, 8, np.array([10.0, 10, 4, 4]))}
    script_common.create_colmap_database(
        tmp_path / "db.db", cameras, {1: "a.png", 2: "b.png"}
    )
    db = sqlite3.connect(str(tmp_path / "db.db"))
    assert db.execute("SELECT COUNT(*) FROM images").fetchone()[0] == 2
    cam_row = db.execute("SELECT model, width FROM cameras").fetchone()
    assert cam_row == (1, 8)  # PINHOLE id 1
    db.close()


def test_colmap_binary_gating(monkeypatch):
    monkeypatch.setattr("shutil.which", lambda name: None)
    with pytest.raises(SystemExit, match="colmap"):
        script_common.require_binary("colmap")


def test_downscale_images_pil_fallback(tmp_path, rng, monkeypatch):
    from PIL import Image

    src = tmp_path / "src"
    src.mkdir()
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)
        ).save(src / f"im_{i}.png")
    monkeypatch.setattr("shutil.which", lambda name: None)  # no ffmpeg
    out = script_common.downscale_images(src, tmp_path / "dst", 2)
    img = Image.open(out / "im_0.png")
    assert img.size == (12, 8)


def test_process_images_arg_validation():
    from tetranerf_tpu.scripts.process_images import main as pi_main

    with pytest.raises(SystemExit, match="exactly one"):
        pi_main(["--output", "/tmp/x"])


def test_train_pointcloud_model_filter(tmp_path, rng):
    """--train-pointcloud: the prior model written for re-triangulation
    must contain only the training images (COLMAP binary gating means the
    triangulator itself can't run here; the model filtering logic can)."""
    from tetranerf_tpu.utils import colmap as cm

    cameras = {
        1: cm.Camera(1, "PINHOLE", 8, 8, np.array([4.0, 4.0, 4.0, 4.0]))
    }
    images = {}
    for i in range(9):
        images[i + 1] = cm.Image(
            image_id=i + 1,
            qvec=np.array([1.0, 0, 0, 0]),
            tvec=np.array([0.0, 0, float(i)]),
            camera_id=1,
            name=f"im_{i:02d}.png",
            xys=np.zeros((0, 2)),
            point3D_ids=np.zeros((0,), np.int64),
        )
    ordered = sorted(images.values(), key=lambda im: im.name)
    eval_idx = set(range(0, len(ordered), 8))
    train_meta = {
        im.image_id: im for i, im in enumerate(ordered) if i not in eval_idx
    }
    assert len(train_meta) == 7  # images 0 and 8 held out
    prior = tmp_path / "prior"
    cm.write_model(cameras, train_meta, {}, prior, binary=False)
    cams2, imgs2, pts2 = cm.read_model(prior)
    assert set(im.name for im in imgs2.values()) == {
        f"im_{i:02d}.png" for i in range(9) if i not in (0, 8)
    }
    assert len(pts2) == 0
