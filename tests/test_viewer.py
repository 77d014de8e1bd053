"""Viewer server test: page + frame requests against a live server."""

import json
import urllib.request

import numpy as np
import pytest

from tetranerf_tpu.geometry import build_mesh
from tetranerf_tpu.models import TetraNerf, TetrahedraNerfConfig
from tetranerf_tpu.training import Trainer, tetranerf_preset
from tetranerf_tpu.utils import make_sphere_scene
from tetranerf_tpu.viewer import ViewerServer


@pytest.fixture(scope="module")
def server():
    points, colors = make_sphere_scene(500, seed=3)
    mesh = build_mesh(points)
    config = tetranerf_preset()
    config.model = TetrahedraNerfConfig(
        num_samples=8, num_fine_samples=8, max_intersected_triangles=64,
        field_dim=8, hidden_size=16, compute_dtype="float32",
    )
    model = TetraNerf(config.model, mesh)
    trainer = Trainer(config, model, point_colors=colors)
    viewer = ViewerServer(trainer, port=0, chunk=512)
    viewer.start()
    port = viewer._httpd.server_address[1]
    yield viewer, port
    viewer.stop()


def test_viewer_page(server):
    _, port = server
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
        body = r.read().decode()
    assert "orbit" in body and "/render" in body


@pytest.mark.parametrize("quality", ["fast", "full"])
def test_viewer_render_png(server, quality):
    from PIL import Image
    import io

    _, port = server
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/render",
        data=json.dumps(
            {"position": [0, 2.5, 0.5], "side": 32, "quality": quality}
        ).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        png = r.read()
        assert r.headers["Content-Type"] == "image/png"
    img = np.asarray(Image.open(io.BytesIO(png)))
    assert img.shape == (32, 32, 3)
    # The sphere occupies the center; background is white.
    assert img[0, 0].min() > 200  # corner = background
    assert img[16, 16].std() >= 0  # center pixel exists/finite


def test_viewer_full_uses_cache(server):
    viewer, port = server
    viewer._caches.clear()
    # Two identical full-quality requests reuse the cached march.
    for _ in range(2):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/render",
            data=json.dumps(
                {"position": [2.5, 0, 0.3], "side": 32, "quality": "full"}
            ).encode(),
            method="POST",
        )
        urllib.request.urlopen(req, timeout=600).read()
    assert len(viewer._caches) == 1
    # A different pose gets its own cache entry.
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/render",
        data=json.dumps(
            {"position": [0, 0, 2.5], "side": 32, "quality": "full"}
        ).encode(),
        method="POST",
    )
    urllib.request.urlopen(req, timeout=600).read()
    assert len(viewer._caches) == 2


def test_viewer_progressive_tiles(server):
    """Row-band tiles composite into the same image as one full frame."""
    from PIL import Image
    import io

    viewer, _ = server
    full = np.asarray(
        Image.open(io.BytesIO(viewer.render_frame([0, 2.5, 0.5], 32, "full")))
    )
    strips = [
        np.asarray(
            Image.open(
                io.BytesIO(
                    viewer.render_frame(
                        [0, 2.5, 0.5], 32, "full", rows=(y, y + 16)
                    )
                )
            )
        )
        for y in (0, 16)
    ]
    assert strips[0].shape == (16, 32, 3)
    np.testing.assert_array_equal(np.concatenate(strips, axis=0), full)


@pytest.mark.parametrize("mode", ["depth", "accumulation"])
def test_viewer_view_modes(server, mode):
    """Depth/accumulation modes return grayscale PNGs with geometry
    contrast (sphere center vs empty corner)."""
    from PIL import Image
    import io

    _, port = server
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/render",
        data=json.dumps(
            {
                "position": [0, 2.5, 0.5],
                "side": 32,
                "quality": "fast",
                "mode": mode,
            }
        ).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        img = np.asarray(Image.open(io.BytesIO(r.read())))
    assert img.shape == (32, 32)  # grayscale
    # Corner ray misses the sphere -> dark; center ray hits -> bright.
    assert int(img[16, 16]) > int(img[0, 0])


def test_viewer_cache_invalidated_on_occupancy_advance():
    """With use_occupancy_field, a march cached before the occupancy /
    termination state advanced must NOT be re-shaded as current: the
    trainer's march_version bumps on occupancy updates and the viewer
    keys caches on it, so a post-update full render re-marches and
    matches a fresh uncached render exactly."""
    from tetranerf_tpu.utils import sample_sphere_rays, sphere_ray_targets

    points, colors = make_sphere_scene(400, seed=4)
    mesh = build_mesh(points)
    config = tetranerf_preset()
    config.model = TetrahedraNerfConfig(
        num_samples=8, num_fine_samples=0, max_intersected_triangles=64,
        field_dim=8, hidden_size=16, compute_dtype="float32",
        use_occupancy_field=True, occupancy_update_every=1,
        occupancy_refresh_every=0, occupancy_retune_every=0,
    )
    model = TetraNerf(config.model, mesh)
    trainer = Trainer(config, model, point_colors=colors)
    viewer = ViewerServer(trainer, port=0, chunk=256)

    pos = [0, 2.5, 0.5]
    png0 = viewer.render_frame(pos, 16, "full")
    assert png0[:4] == b"\x89PNG"
    v0 = trainer.march_version
    keys0 = set(viewer._caches)
    assert len(keys0) == 1

    rng = np.random.default_rng(1)
    o, d = sample_sphere_rays(rng, 64)
    for _ in range(3):  # occupancy EMA updates bump march_version
        trainer.train_step(
            {"origins": o, "directions": d, "rgb": sphere_ray_targets(o, d)}
        )
    assert trainer.march_version > v0

    viewer.render_frame(pos, 16, "full")
    assert set(viewer._caches) != keys0  # stale cache not reused

    # The re-marched refine equals a fresh uncached render of the rays.
    c2w = __import__(
        "tetranerf_tpu.viewer", fromlist=["_look_at"]
    )._look_at(pos)
    from tetranerf_tpu.viewer import _camera_rays

    ro, rd = _camera_rays(c2w, 16, viewer.camera_angle_x)
    cache = trainer.cache_camera(ro, rd, chunk=256, sort_by_depth=True)
    cached = trainer.render_cached(cache, adaptive_samples=True)
    fresh = trainer.render_rays(ro, rd, chunk=256)
    np.testing.assert_allclose(
        cached["rgb"], fresh["rgb"], atol=1e-5
    )


def test_viewer_live_training(server):
    """Frames keep rendering while train steps run concurrently (the
    --viewer-port live path); donated-buffer races resolve via retry."""
    import threading

    from tetranerf_tpu.utils import sample_sphere_rays, sphere_ray_targets

    viewer, port = server
    rng = np.random.default_rng(0)

    def steps():
        for _ in range(6):
            o, d = sample_sphere_rays(rng, 64)
            viewer.trainer.train_step(
                {
                    "origins": o,
                    "directions": d,
                    "rgb": sphere_ray_targets(o, d),
                }
            )

    t = threading.Thread(target=steps)
    t.start()
    try:
        for _ in range(3):
            png = viewer.render_frame([2.5, 0.3, 0.4], 16, "fast")
            assert png[:4] == b"\x89PNG"
    finally:
        t.join()
