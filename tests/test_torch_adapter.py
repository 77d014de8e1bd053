"""Torch-facing adapter: the decided nerfstudio interop surface.

Training is native (single-XLA-program step); what nerfstudio tooling
consumes from a Model — chunked ray rendering and reference-layout
state dicts — is provided to torch callers by
``tetranerf_tpu.torch_adapter.TorchRenderAdapter`` (see docs/PARITY.md).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tetranerf_tpu.geometry import build_mesh
from tetranerf_tpu.models import TetraNerf, TetrahedraNerfConfig
from tetranerf_tpu.torch_adapter import TorchRenderAdapter
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


def test_render_torch_in_torch_out(trainer):
    adapter = TorchRenderAdapter(trainer, chunk=64)
    rng = np.random.default_rng(1)
    o, d = sample_sphere_rays(rng, 100)  # non-multiple of chunk
    out = adapter.get_outputs(torch.from_numpy(o), torch.from_numpy(d))
    assert torch.is_tensor(out["rgb"])
    assert out["rgb"].shape == (100, 3)
    assert out["depth"].shape == (100, 1)
    assert out["accumulation"].shape == (100, 1)
    # Matches the native render path exactly.
    native = trainer.render_rays(o, d, chunk=64)
    np.testing.assert_allclose(
        out["rgb"].numpy(), native["rgb"], rtol=1e-5, atol=1e-6
    )


def test_render_image_grid(trainer):
    adapter = TorchRenderAdapter(trainer, chunk=64)
    rng = np.random.default_rng(2)
    o, d = sample_sphere_rays(rng, 48)
    out = adapter.render_image(
        torch.from_numpy(o.reshape(6, 8, 3)),
        torch.from_numpy(d.reshape(6, 8, 3)),
        num_fine_samples=0,
    )
    assert out["rgb"].shape == (6, 8, 3)
    assert out["depth"].shape == (6, 8, 1)


def test_state_dict_reference_layout_roundtrip(trainer):
    adapter = TorchRenderAdapter(trainer, chunk=64)
    sd = adapter.state_dict()
    assert all(torch.is_tensor(v) for v in sd.values())
    # Reference stores the field [F, V] (model.py:249-255).
    V = trainer.model.mesh.num_vertices
    F = trainer.model.config.field_dim
    assert sd["tetrahedra_field"].shape == (F, V)
    # Round-trip through a perturbed copy changes the render.
    rng = np.random.default_rng(3)
    o, d = sample_sphere_rays(rng, 64)
    before = adapter.get_outputs(torch.from_numpy(o), torch.from_numpy(d))
    sd2 = {k: v.clone() for k, v in sd.items()}
    sd2["tetrahedra_field"] += 0.5
    adapter.load_state_dict(sd2)
    after = adapter.get_outputs(torch.from_numpy(o), torch.from_numpy(d))
    assert not np.allclose(before["rgb"].numpy(), after["rgb"].numpy())
    # Restoring the original brings the render back bit-for-bit.
    adapter.load_state_dict(sd)
    restored = adapter.get_outputs(torch.from_numpy(o), torch.from_numpy(d))
    np.testing.assert_allclose(
        restored["rgb"].numpy(), before["rgb"].numpy(), rtol=0, atol=0
    )


def test_bad_shapes_rejected(trainer):
    adapter = TorchRenderAdapter(trainer)
    with pytest.raises(ValueError):
        adapter.get_outputs(torch.zeros(4, 2), torch.zeros(4, 2))
    with pytest.raises(ValueError):
        adapter.get_outputs(torch.zeros(4, 3), torch.zeros(5, 3))


def test_adapter_model_camera_ray_bundle(trainer):
    """The nerfstudio-facing Model subclass drives
    ``get_outputs_for_camera_ray_bundle``-style chunked calls through
    the adapter (the ns-eval/viewer contract, reference
    ``model.py:520-662``), reassembling image-shaped torch tensors that
    match the native render exactly."""
    import types

    from tetranerf_tpu.nerfstudio_model import (
        HAVE_NERFSTUDIO,
        TetraNerfAdapterModel,
    )

    rng = np.random.default_rng(4)
    o, d = sample_sphere_rays(rng, 96)
    bundle = types.SimpleNamespace(
        origins=torch.from_numpy(o.reshape(8, 12, 3)),
        directions=torch.from_numpy(d.reshape(8, 12, 3)),
    )
    model = TetraNerfAdapterModel(trainer, chunk=40)  # forces 3 chunks
    out = model.get_outputs_for_camera_ray_bundle(bundle)
    assert out["rgb"].shape == (8, 12, 3)
    assert out["depth"].shape == (8, 12, 1)
    assert out["accumulation"].shape == (8, 12, 1)
    native = trainer.render_rays(o, d, chunk=40)
    np.testing.assert_allclose(
        out["rgb"].numpy().reshape(-1, 3), native["rgb"],
        rtol=1e-5, atol=1e-6,
    )
    # Single-chunk get_outputs keeps the bundle's leading shape too.
    single = model.get_outputs(bundle)
    np.testing.assert_allclose(
        single["rgb"].numpy(), out["rgb"].numpy(), rtol=1e-5, atol=1e-6
    )
    # Render-only: torch training hooks refuse loudly.
    assert model.get_param_groups() == {}
    with pytest.raises(RuntimeError, match="render-only"):
        model.get_loss_dict(None)
    if HAVE_NERFSTUDIO:  # real inheritance where nerfstudio exists
        from nerfstudio.models.base_model import Model

        assert isinstance(model, Model)


def test_ns_train_redirect_contract():
    """Without nerfstudio installed, the method entry points raise an
    ImportError carrying the native-CLI instructions — the documented
    ``ns-train`` contract (docs/PARITY.md)."""
    from tetranerf_tpu import nerfstudio_compat

    for fn, name in (
        (nerfstudio_compat.tetranerf, "tetra-nerf"),
        (nerfstudio_compat.tetranerf_original, "tetra-nerf-original"),
    ):
        with pytest.raises(ImportError) as exc:
            fn()
        msg = str(exc.value)
        assert f"tetranerf-train --method {name}" in msg
