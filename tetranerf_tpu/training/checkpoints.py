"""Checkpointing (orbax) with the reference's self-containment contract.

The reference keeps checkpoints self-contained — tetrahedra vertices/cells
are persisted buffers, LPIPS weights are stripped, and the field is stored
``[F, V]`` (``tetranerf/nerfstudio/model.py:239-300, 480-495``). Here the
training state (params incl. the field, optimizer state, step) is saved
with orbax; :func:`reference_state_dict` exposes the parameters under the
reference's tensor names/layouts for interop.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(path: str, state, config=None) -> None:
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    if config is not None:
        import dataclasses
        import json

        def enc(o):
            if dataclasses.is_dataclass(o):
                return {k: enc(v) for k, v in dataclasses.asdict(o).items()}
            if isinstance(o, dict):
                return {k: enc(v) for k, v in o.items()}
            if isinstance(o, (list, tuple)):
                return [enc(v) for v in o]
            if isinstance(o, os.PathLike):
                return str(o)
            return o

        with open(os.path.join(path, "train_config.json"), "w") as f:
            json.dump(enc(config), f, indent=2, default=str)


def restore_checkpoint(path: str, target_state):
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        if hasattr(x, "sharding")
        else x,
        target_state,
    )
    return ckptr.restore(path, abstract)


def reference_state_dict(params) -> Dict[str, np.ndarray]:
    """Export parameters under the reference's tensor names.

    - ``tetrahedra_field``: ``[F, V]`` (we store ``[V, F]`` for contiguous
      gathers; reference layout at ``model.py:249-255``).
    - MLPs: ``mlp_base.layers.{i}.weight/bias`` with torch's ``[out, in]``
      weight layout.
    """
    out: Dict[str, np.ndarray] = {
        "tetrahedra_field": np.asarray(params["tetrahedra_field"]).T,
    }
    for name in ("mlp_base", "mlp_head"):
        for i, layer in enumerate(params[name]):
            out[f"{name}.layers.{2 * i}.weight"] = np.asarray(
                layer["kernel"]
            ).T
            out[f"{name}.layers.{2 * i}.bias"] = np.asarray(layer["bias"])
    for name in ("field_output_color", "field_output_density"):
        out[f"{name}.net.weight"] = np.asarray(params[name]["kernel"]).T
        out[f"{name}.net.bias"] = np.asarray(params[name]["bias"])
    if "appearance_embedding" in params:
        out["appearance_embedding.weight"] = np.asarray(
            params["appearance_embedding"]
        )
    return out


def load_reference_state_dict(params, state_dict: Dict[str, Any]):
    """Import reference-layout tensors into our parameter tree."""
    import jax.numpy as jnp

    params = dict(params)
    if "tetrahedra_field" in state_dict:
        params["tetrahedra_field"] = jnp.asarray(
            np.asarray(state_dict["tetrahedra_field"]).T
        )
    for name in ("mlp_base", "mlp_head"):
        layers = []
        for i, layer in enumerate(params[name]):
            w = state_dict.get(f"{name}.layers.{2 * i}.weight")
            b = state_dict.get(f"{name}.layers.{2 * i}.bias")
            layers.append(
                {
                    "kernel": jnp.asarray(np.asarray(w).T)
                    if w is not None
                    else layer["kernel"],
                    "bias": jnp.asarray(np.asarray(b))
                    if b is not None
                    else layer["bias"],
                }
            )
        params[name] = layers
    for name in ("field_output_color", "field_output_density"):
        w = state_dict.get(f"{name}.net.weight")
        b = state_dict.get(f"{name}.net.bias")
        if w is not None:
            params[name] = {
                "kernel": jnp.asarray(np.asarray(w).T),
                "bias": jnp.asarray(np.asarray(b)),
            }
    if "appearance_embedding.weight" in state_dict:
        params["appearance_embedding"] = jnp.asarray(
            np.asarray(state_dict["appearance_embedding.weight"])
        )
    return params
