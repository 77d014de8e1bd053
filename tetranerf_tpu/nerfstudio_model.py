"""nerfstudio-facing ``Model`` over a trained TPU checkpoint.

Completes the torch-side integration story (docs/PARITY.md): training
stays native (single-XLA-program step), but ``ns-eval`` and the
nerfstudio viewer only ever drive a ``Model`` through chunked
``get_outputs(ray_bundle)`` / ``get_outputs_for_camera_ray_bundle``
calls and consume ``rgb``/``depth``/``accumulation`` tensors (reference
contract: ``tetranerf/nerfstudio/model.py:520-662``, consumed via
nerfstudio's base ``Model.get_outputs_for_camera_ray_bundle``). This
module provides exactly that surface: a ``Model`` subclass whose
forward delegates to :class:`tetranerf_tpu.torch_adapter.
TorchRenderAdapter`, so torch pipelines evaluate/visualize a trained
TPU checkpoint through nerfstudio proper.

When nerfstudio is not installed, the class derives from a minimal shim
implementing the same chunked-render contract — the chunk loop and
output plumbing stay importable and tested everywhere; the nerfstudio
inheritance engages automatically where it matters.
"""

from __future__ import annotations

from typing import Dict, Optional

try:  # pragma: no cover - exercised only where nerfstudio is installed
    from nerfstudio.models.base_model import Model as _BaseModel

    HAVE_NERFSTUDIO = True
except Exception:  # nerfstudio absent: duck-typed shim, same contract
    HAVE_NERFSTUDIO = False

    class _BaseModel:  # type: ignore[no-redef]
        """Minimal stand-in for ``nerfstudio.models.base_model.Model``:
        just enough surface for the adapter's overrides to exist on."""

        def __init__(self, *args, **kwargs):
            pass


class TetraNerfAdapterModel(_BaseModel):
    """Chunked torch render ``Model`` over a trained TPU trainer.

    Usage (after restoring a checkpoint)::

        trainer.restore_checkpoint("outputs/final")
        model = TetraNerfAdapterModel(trainer)
        outputs = model.get_outputs_for_camera_ray_bundle(bundle)

    ``bundle`` needs ``origins``/``directions`` torch tensors of shape
    ``[..., 3]`` (nerfstudio's ``RayBundle``/camera bundles qualify).
    Outputs are torch tensors shaped like the bundle's leading dims —
    the reference model's output schema (``model.py:640-655``).
    """

    def __init__(
        self,
        trainer,
        chunk: int = 8192,
        num_samples: Optional[int] = None,
        num_fine_samples: Optional[int] = None,
    ):
        # Deliberately does NOT call nerfstudio Model.__init__ (which
        # builds a full torch training model); this adapter is a
        # render-only surface over already-trained parameters.
        from .torch_adapter import TorchRenderAdapter

        self.adapter = TorchRenderAdapter(trainer, chunk=chunk)
        self.chunk = chunk
        self.num_samples = num_samples
        self.num_fine_samples = num_fine_samples
        self._lpips = None

    # -- nerfstudio Model contract ------------------------------------
    def get_outputs(self, ray_bundle) -> Dict[str, "torch.Tensor"]:
        """One chunk: render the bundle's rays against the TPU model."""
        o, d = ray_bundle.origins, ray_bundle.directions
        lead = o.shape[:-1]
        out = self.adapter.get_outputs(
            o.reshape(-1, 3),
            d.reshape(-1, 3),
            num_samples=self.num_samples,
            num_fine_samples=self.num_fine_samples,
        )
        return {k: v.reshape(*lead, *v.shape[1:]) for k, v in out.items()}

    @staticmethod
    def _slice_bundle(bundle, start: int, end: int):
        """Row-major slice of a flattened bundle — works with real
        nerfstudio bundles (``get_row_major_sliced_ray_bundle``) and
        plain duck-typed objects alike."""
        if hasattr(bundle, "get_row_major_sliced_ray_bundle"):
            return bundle.get_row_major_sliced_ray_bundle(start, end)
        import types

        o = bundle.origins.reshape(-1, 3)[start:end]
        d = bundle.directions.reshape(-1, 3)[start:end]
        return types.SimpleNamespace(origins=o, directions=d)

    def get_outputs_for_camera_ray_bundle(
        self, camera_ray_bundle
    ) -> Dict[str, "torch.Tensor"]:
        """The ``ns-eval``/viewer entry: chunk the camera's rays row-
        major, render each chunk, reassemble image-shaped tensors
        (mirrors nerfstudio's base implementation the reference relies
        on for its whole eval path, ``model.py:676-713``)."""
        import torch

        lead = camera_ray_bundle.origins.shape[:-1]
        num = int(torch.tensor(lead).prod()) if lead else 1
        chunks = []
        for start in range(0, num, self.chunk):
            sub = self._slice_bundle(
                camera_ray_bundle, start, min(start + self.chunk, num)
            )
            chunks.append(
                self.adapter.get_outputs(
                    sub.origins.reshape(-1, 3),
                    sub.directions.reshape(-1, 3),
                    num_samples=self.num_samples,
                    num_fine_samples=self.num_fine_samples,
                )
            )
        out = {
            k: torch.cat([c[k] for c in chunks], dim=0)
            for k in chunks[0]
        }
        return {k: v.reshape(*lead, *v.shape[1:]) for k, v in out.items()}

    def get_image_metrics_and_images(self, outputs, batch):
        """``ns-eval``'s per-image hook (ref ``model.py:676-713``):
        PSNR, nerfstudio-protocol SSIM (gaussian 11/1.5) and
        skimage-protocol SSIM (uniform 7, sample covariance) via the
        validated JAX implementations, plus LPIPS when weights are
        available (otherwise omitted — the offline-weights constraint
        record in docs/RESULTS.md)."""
        import numpy as np
        import torch

        from .training import metrics as m

        image = batch["image"].to(outputs["rgb"].device)
        rgb = outputs["rgb"]
        img_np = image.detach().cpu().numpy().astype(np.float32)
        rgb_np = rgb.detach().cpu().numpy().astype(np.float32)
        if self._lpips is None:
            self._lpips = m.Lpips()
        metrics_dict = m.compute_image_metrics(
            rgb_np, img_np, lpips=self._lpips
        )
        # ns-eval's key names for the SSIM protocols (ref
        # model.py:699-707). The reference reports BOTH nerfstudio_ssim
        # (torchmetrics gaussian-11) and mipnerf_ssim (dm-pix); our JAX
        # implementation IS the gaussian-11 protocol, so the same value
        # legitimately serves both keys.
        metrics_dict["nerfstudio_ssim"] = metrics_dict["mipnerf_ssim"]
        acc = outputs["accumulation"]
        depth = outputs["depth"]
        try:  # colormapped tensors for viewer parity (ref model.py:687-692)
            from nerfstudio.utils import colormaps

            acc = colormaps.apply_colormap(acc)
            depth = colormaps.apply_depth_colormap(
                depth, accumulation=outputs["accumulation"]
            )
        except Exception:  # pragma: no cover - older nerfstudio APIs
            pass
        images_dict = {
            "img": torch.cat([image, rgb], dim=1),
            "accumulation": acc,
            "depth": depth,
        }
        return metrics_dict, images_dict

    # Render-only surface: the torch optimizer/loss hooks of the full
    # nerfstudio Model contract are intentionally unsupported (training
    # is native; see nerfstudio_compat._HELP).
    def get_param_groups(self):  # pragma: no cover - contract stub
        return {}

    def get_loss_dict(self, *a, **k):  # pragma: no cover - contract stub
        raise RuntimeError(
            "TetraNerfAdapterModel is render-only; train natively with "
            "tetranerf-train (see tetranerf_tpu/nerfstudio_compat.py)."
        )
