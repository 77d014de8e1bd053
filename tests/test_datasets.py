"""Dataset loaders, ray generation geometry, COLMAP IO."""

import json

import numpy as np
import pytest

from tetranerf_tpu.training.datasets import (
    SceneDataset,
    apply_transform,
    load_blender,
    load_colmap,
    load_minimal_npz,
    normalize_poses,
)
from tetranerf_tpu.utils import colmap as cm


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


@pytest.fixture()
def blender_dir(tmp_path, rng):
    frames = []
    for i in range(3):
        # Camera at distance 4 on the x-y circle, looking at the origin.
        ang = i * 2.0
        pos = np.array([4 * np.cos(ang), 4 * np.sin(ang), 1.0])
        forward = -pos / np.linalg.norm(pos)  # camera -z
        right = np.cross(forward, [0, 0, 1.0])
        right /= np.linalg.norm(right)
        up = np.cross(right, forward)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = right, up, -forward
        c2w[:3, 3] = pos
        img = rng.integers(0, 255, size=(16, 16, 4), dtype=np.uint8)
        img[..., 3] = 255
        _write_png(tmp_path / f"r_{i}.png", img)
        frames.append(
            {"file_path": f"./r_{i}", "transform_matrix": c2w.tolist()}
        )
    meta = {"camera_angle_x": 0.7, "frames": frames}
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump(meta, f)
    return tmp_path


def test_load_blender_and_rays(blender_dir):
    ds = load_blender(blender_dir, "train")
    assert ds.images.shape == (3, 16, 16, 3)
    assert ds.camera_to_worlds.shape == (3, 3, 4)
    o, d = ds.camera_rays(0)
    assert o.shape == (256, 3) and d.shape == (256, 3)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    # The central pixel's ray points along camera -z (toward the origin).
    center_pix = 8 * 16 + 8
    cam_fwd = -ds.camera_to_worlds[0, :3, 2]
    assert float(d[center_pix] @ cam_fwd) > 0.99
    # Ray batch sampling.
    batch = ds.sample_ray_batch(np.random.default_rng(0), 64)
    assert batch["origins"].shape == (64, 3)
    assert batch["rgb"].shape == (64, 3)
    assert (batch["camera_indices"] < 3).all()


def test_minimal_npz_roundtrip(tmp_path, blender_dir):
    ds = load_blender(blender_dir, "train")
    cameras = dict(
        camera_to_worlds=ds.camera_to_worlds,
        fx=ds.fx,
        fy=ds.fy,
        cx=ds.cx,
        cy=ds.cy,
        width=np.int32(ds.width),
        height=np.int32(ds.height),
        camera_type=np.int32(1),
    )
    np.savez(
        tmp_path / "train.npz",
        image_filenames=[str(blender_dir / f"r_{i}.png") for i in range(3)],
        cameras=np.array(cameras),
        scene_box=np.array([[-1, -1, -1], [1, 1, 1]], np.float32),
    )
    ds2 = load_minimal_npz(tmp_path / "train.npz")
    np.testing.assert_allclose(
        ds2.camera_to_worlds, ds.camera_to_worlds, atol=1e-6
    )
    np.testing.assert_allclose(ds2.images, ds.images, atol=1e-6)
    assert ds2.width == 16 and ds2.height == 16


def test_normalize_poses():
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4), (5, 1, 1))
    # Cameras with up vector along +y (world), spread around.
    poses[:, :3, 3] = rng.normal(scale=2.0, size=(5, 3))
    new, transform, scale = normalize_poses(poses)
    # Mean up (+y columns) must map to +z.
    up = new[:, :3, 1].mean(axis=0)
    up /= np.linalg.norm(up)
    np.testing.assert_allclose(up, [0, 0, 1], atol=1e-6)
    # Translations are centered-ish and bounded by 1.
    assert np.abs(new[:, :3, 3]).max() == pytest.approx(1.0, abs=1e-6)
    # apply_transform maps the raw camera centers to the new ones.
    mapped = apply_transform(poses[:, :3, 3], transform, scale)
    np.testing.assert_allclose(mapped, new[:, :3, 3], atol=1e-9)


def test_colmap_roundtrip_and_load(tmp_path, rng):
    cameras = {
        1: cm.Camera(1, "PINHOLE", 32, 24, np.array([40.0, 41.0, 16.0, 12.0]))
    }
    images = {}
    for i in range(1, 5):
        r = cm.qvec_to_rotmat(np.array([1.0, 0, 0, 0]))
        q = cm.rotmat_to_qvec(r)
        images[i] = cm.Image(
            i,
            q,
            rng.normal(size=3),
            1,
            f"im_{i}.png",
            rng.uniform(0, 30, size=(3, 2)),
            np.array([1, -1, 2], np.int64),
        )
    points = {
        j: cm.Point3D(
            j,
            rng.normal(size=3),
            rng.integers(0, 255, 3).astype(np.uint8),
            0.5,
            np.array([1, 2], np.int32),
            np.array([0, 1], np.int32),
        )
        for j in range(1, 20)
    }
    for binary in (True, False):
        out = tmp_path / ("bin" if binary else "txt")
        cm.write_model(cameras, images, points, out, binary=binary)
        c2, i2, p2 = cm.read_model(out)
        assert c2[1].model == "PINHOLE"
        np.testing.assert_allclose(c2[1].params, cameras[1].params)
        np.testing.assert_allclose(i2[3].tvec, images[3].tvec)
        np.testing.assert_allclose(i2[3].qvec, images[3].qvec, atol=1e-9)
        np.testing.assert_array_equal(i2[2].point3D_ids, [1, -1, 2])
        np.testing.assert_allclose(p2[5].xyz, points[5].xyz)
        np.testing.assert_array_equal(p2[5].image_ids, [1, 2])

    # Full dataset load path over the binary model.
    img_dir = tmp_path / "bin" / "images"
    img_dir.mkdir()
    for i in range(1, 5):
        _write_png(
            img_dir / f"im_{i}.png",
            rng.integers(0, 255, size=(24, 32, 3), dtype=np.uint8),
        )
    ds = load_colmap(tmp_path / "bin")
    assert isinstance(ds, SceneDataset)
    assert ds.images.shape == (4, 24, 32, 3)
    assert ds.points3d_xyz.shape == (19, 3)
    assert np.abs(ds.camera_to_worlds[:, :3, 3]).max() <= 1.0 + 1e-6


def test_qvec_rotmat_roundtrip(rng):
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        r = cm.qvec_to_rotmat(q)
        assert np.allclose(r @ r.T, np.eye(3), atol=1e-10)
        q2 = cm.rotmat_to_qvec(r)
        np.testing.assert_allclose(q2, q, atol=1e-8)


def test_rgba_composited_over_white(tmp_path):
    from PIL import Image
    from tetranerf_tpu.training.datasets import _load_image

    rgba = np.zeros((4, 4, 4), np.uint8)
    rgba[..., 0] = 200  # red
    rgba[..., 3] = 128  # half transparent
    path = tmp_path / "a.png"
    Image.fromarray(rgba, "RGBA").save(path)
    img = _load_image(path)
    alpha = 128 / 255.0
    np.testing.assert_allclose(
        img[0, 0],
        [200 / 255.0 * alpha + (1 - alpha), 1 - alpha, 1 - alpha],
        atol=1e-6,
    )
