"""Torch-facing render adapter over the jitted TPU render path.

The decided ``ns-train`` story (docs/PARITY.md): training stays native —
nerfstudio's torch ``Trainer`` drives per-chunk device round trips that
would forfeit the single-XLA-program step — but everything downstream of
training that nerfstudio-side tooling actually calls on a ``Model`` is a
chunked *render*: ``ns-eval`` and the nerfstudio viewer loop over
``get_outputs(ray_bundle)`` per ray chunk and consume
``rgb``/``depth``/``accumulation`` tensors
(``/root/reference/tetranerf/nerfstudio/model.py:520-662``, consumed via
nerfstudio's ``get_outputs_for_camera_ray_bundle``). This adapter
provides exactly that surface with torch tensors in and torch tensors
out, so torch pipelines can evaluate/visualize a trained TPU model
without touching JAX. Parameter interop uses the reference's own tensor
names/layouts (``training/checkpoints.reference_state_dict``), so a
model trained here can also be compared tensor-for-tensor against a
reference checkpoint.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class TorchRenderAdapter:
    """Chunked torch-tensor render interface for a trained model.

    Parameters
    ----------
    trainer:
        A :class:`tetranerf_tpu.training.Trainer` holding the trained
        state (or one freshly restored via ``restore_checkpoint``).
    chunk:
        Rays per jitted render dispatch (the reference's eval path
        chunks the same way through nerfstudio).
    """

    def __init__(self, trainer, chunk: int = 8192):
        self.trainer = trainer
        self.chunk = chunk

    # ------------------------------------------------------------- render
    def get_outputs(
        self,
        origins,
        directions,
        num_samples: Optional[int] = None,
        num_fine_samples: Optional[int] = None,
    ) -> Dict[str, "torch.Tensor"]:
        """Render rays given as torch tensors ``[N, 3]``.

        Returns torch tensors ``rgb [N, 3]``, ``depth [N, 1]``,
        ``accumulation [N, 1]`` and ``ray_mask [N]`` on the input's
        device (the reference model's output schema,
        ``model.py:640-655``).
        """
        import torch

        device = origins.device if torch.is_tensor(origins) else "cpu"
        o = self._to_numpy(origins)
        d = self._to_numpy(directions)
        if o.ndim != 2 or o.shape[-1] != 3 or o.shape != d.shape:
            raise ValueError(
                f"expected matching [N, 3] origins/directions, got "
                f"{o.shape} and {d.shape}"
            )
        out = self.trainer.render_rays(
            o,
            d,
            chunk=self.chunk,
            num_samples=num_samples,
            num_fine_samples=num_fine_samples,
        )
        return {
            k: torch.from_numpy(np.ascontiguousarray(v)).to(device)
            for k, v in out.items()
        }

    def render_image(
        self, origins, directions, **kwargs
    ) -> Dict[str, "torch.Tensor"]:
        """Render an ``[H, W, 3]`` ray grid, returning ``[H, W, C]``
        torch tensors (the viewer/eval image path)."""
        import torch  # noqa: F401  (shape handling only)

        h, w = origins.shape[:2]
        flat = self.get_outputs(
            origins.reshape(-1, 3), directions.reshape(-1, 3), **kwargs
        )
        return {k: v.reshape(h, w, *v.shape[1:]) for k, v in flat.items()}

    # ------------------------------------------------------- state interop
    def state_dict(self) -> Dict[str, "torch.Tensor"]:
        """Parameters as torch tensors under the REFERENCE's names and
        layouts (``tetrahedra_field [F, V]`` etc.; ``model.py:249-255``)."""
        import torch

        from .training.checkpoints import reference_state_dict

        return {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in reference_state_dict(
                self.trainer.state.params
            ).items()
        }

    def load_state_dict(self, state_dict: Dict[str, "torch.Tensor"]):
        """Import reference-layout torch tensors into the live trainer."""
        import jax

        from .training.checkpoints import load_reference_state_dict

        np_state = {
            k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in state_dict.items()
        }
        params = load_reference_state_dict(
            jax.device_get(self.trainer.state.params), np_state
        )
        self.trainer.state = self.trainer.state.replace(
            params=jax.device_put(
                params, self.trainer._state_sharding.params
            )
        )

    @staticmethod
    def _to_numpy(t) -> np.ndarray:
        if hasattr(t, "detach"):
            return t.detach().cpu().numpy().astype(np.float32)
        return np.asarray(t, np.float32)
