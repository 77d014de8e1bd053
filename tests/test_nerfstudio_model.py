"""nerfstudio ``Model`` adapter: chunked eval contract + metric hook.

``ns-eval``/the nerfstudio viewer consume a Model exclusively through
``get_outputs_for_camera_ray_bundle`` — chunk the camera's rays
row-major, render per chunk via ``get_outputs``, concatenate, reshape —
and score each image through ``get_image_metrics_and_images``
(ref ``tetranerf/nerfstudio/model.py:520-713``). These tests drive that
full loop through :class:`TetraNerfAdapterModel` with duck-typed
bundles (the basic chunking test lives in ``test_torch_adapter.py``);
the last test exercises the real nerfstudio base when installed.
"""

from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tetranerf_tpu.geometry import build_mesh
from tetranerf_tpu.models import TetraNerf, TetrahedraNerfConfig
from tetranerf_tpu.nerfstudio_model import (
    HAVE_NERFSTUDIO,
    TetraNerfAdapterModel,
)
from tetranerf_tpu.training import Trainer, tetranerf_preset
from tetranerf_tpu.utils import (
    make_sphere_scene,
    sample_sphere_rays,
    sphere_ray_targets,
)


@pytest.fixture(scope="module")
def trainer():
    points, colors = make_sphere_scene(500, seed=3)
    mesh = build_mesh(points)
    config = tetranerf_preset()
    config.model = TetrahedraNerfConfig(
        num_samples=12,
        num_fine_samples=8,
        max_intersected_triangles=64,
        field_dim=8,
        hidden_size=16,
        compute_dtype="float32",
    )
    model = TetraNerf(config.model, mesh)
    tr = Trainer(config, model, point_colors=colors)
    rng = np.random.default_rng(0)
    o, d = sample_sphere_rays(rng, 128)
    tr.train_step(
        {"origins": o, "directions": d, "rgb": sphere_ray_targets(o, d)}
    )
    return tr


def _camera_grid(h=8, w=12):
    """A tiny pinhole looking at the sphere from +z (torch [H, W, 3])."""
    ys, xs = np.meshgrid(
        np.linspace(-0.4, 0.4, h), np.linspace(-0.55, 0.55, w), indexing="ij"
    )
    dirs = np.stack([xs, ys, -np.ones_like(xs)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.broadcast_to(
        np.array([0.0, 0.0, 2.5], np.float32), dirs.shape
    )
    return (
        torch.from_numpy(np.ascontiguousarray(origins, np.float32)),
        torch.from_numpy(np.ascontiguousarray(dirs.astype(np.float32))),
    )


def test_chunk_size_independence(trainer):
    """The chunk loop must be invisible: any chunk size, same image."""
    o, d = _camera_grid()
    bundle = SimpleNamespace(origins=o, directions=d)
    outs = []
    for chunk in (7, 4096):
        model = TetraNerfAdapterModel(trainer, chunk=chunk)
        outs.append(model.get_outputs_for_camera_ray_bundle(bundle))
    np.testing.assert_allclose(
        outs[0]["rgb"].numpy(), outs[1]["rgb"].numpy(), atol=1e-5
    )
    h, w = o.shape[:2]
    assert outs[0]["rgb"].shape == (h, w, 3)
    assert outs[0]["depth"].shape == (h, w, 1)
    assert outs[0]["accumulation"].shape == (h, w, 1)
    # ...and identical to one direct flat render through the trainer.
    direct = trainer.render_rays(
        o.reshape(-1, 3).numpy(), d.reshape(-1, 3).numpy(), chunk=4096
    )
    np.testing.assert_allclose(
        outs[1]["rgb"].numpy().reshape(-1, 3), direct["rgb"], atol=1e-5
    )


def test_image_metrics_hook(trainer):
    model = TetraNerfAdapterModel(trainer, chunk=64)
    o, d = _camera_grid()
    bundle = SimpleNamespace(origins=o, directions=d)
    out = model.get_outputs_for_camera_ray_bundle(bundle)
    batch = {"image": out["rgb"].clone()}
    metrics, images = model.get_image_metrics_and_images(out, batch)
    assert metrics["psnr"] > 40.0  # identical image
    assert 0.98 <= metrics["nerfstudio_ssim"] <= 1.0001
    assert 0.98 <= metrics["skimage_ssim"] <= 1.0001
    assert images["img"].shape[1] == 2 * out["rgb"].shape[1]
    assert model.get_param_groups() == {}
    with pytest.raises(RuntimeError, match="render-only"):
        model.get_loss_dict(out, batch)


def test_real_nerfstudio_base(trainer):
    if not HAVE_NERFSTUDIO:
        pytest.skip("nerfstudio not installed")
    from nerfstudio.cameras.rays import RayBundle  # type: ignore

    model = TetraNerfAdapterModel(trainer, chunk=13)
    o, d = _camera_grid()
    bundle = RayBundle(
        origins=o,
        directions=d,
        pixel_area=torch.ones(*o.shape[:2], 1),
    )
    out = model.get_outputs_for_camera_ray_bundle(bundle)
    assert out["rgb"].shape == (*o.shape[:2], 3)
