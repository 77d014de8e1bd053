"""LPIPS in JAX with an offline-weights path.

The reference computes LPIPS through torchmetrics, which downloads
pretrained AlexNet/VGG weights on first use
(``tetranerf/nerfstudio/model.py:474-478, 695-707``) — impossible in a
zero-egress environment. Here the metric itself is a pure-JAX function
over a weight pytree loaded from a local ``.npz`` file:

- :func:`load_lpips_params` reads the npz (see below for the schema);
- :func:`lpips` computes the distance for ``[H, W, 3]`` images in [0, 1];
- :func:`export_lpips_weights` converts the torch ``lpips`` package's
  pretrained weights to the npz schema on a machine that has them.

npz schema (AlexNet backbone, ``net_type='alex'``)::

    conv{i}_kernel  f32[kh, kw, cin, cout]   (HWIO)
    conv{i}_bias    f32[cout]
    lin{i}          f32[c_i]                 per-channel calibration
    net_type        'alex' | 'vgg'

The LPIPS definition follows Zhang et al., CVPR 2018: images are scaled
to [-1, 1], shifted/scaled per channel, passed through the (frozen)
backbone; each tap's activations are channel-unit-normalized, the squared
difference is weighted by the calibration vector and averaged over space,
and tap contributions are summed.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Per-channel input normalization from the original implementation
# (github.com/richzhang/PerceptualSimilarity, scaling_layer).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# (kernel_h/w, stride, padding, maxpool_before) per conv layer; taps are
# taken after every ReLU for alex, after each block's last ReLU for vgg.
_ALEX_LAYERS = [
    (11, 4, 2, False),
    (5, 1, 2, True),
    (3, 1, 1, True),
    (3, 1, 1, False),
    (3, 1, 1, False),
]
_ALEX_CHANNELS = [64, 192, 384, 256, 256]
_ALEX_TAPS = [0, 1, 2, 3, 4]

_VGG_CHANNELS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
_VGG_POOL_BEFORE = [
    False, False, True, False, True, False, False,
    True, False, False, True, False, False,
]
_VGG_LAYERS = [(3, 1, 1, p) for p in _VGG_POOL_BEFORE]
_VGG_TAPS = [1, 3, 6, 9, 12]


def _arch(net_type: str) -> Tuple[list, list, list]:
    if net_type == "alex":
        return _ALEX_LAYERS, _ALEX_CHANNELS, _ALEX_TAPS
    if net_type == "vgg":
        return _VGG_LAYERS, _VGG_CHANNELS, _VGG_TAPS
    raise ValueError(f"unknown net_type {net_type!r}")


def init_lpips_params(key, net_type: str = "alex") -> Dict[str, np.ndarray]:
    """Random-weight parameter dict with the correct shapes (for tests)."""
    layers, channels, taps = _arch(net_type)
    params: Dict[str, np.ndarray] = {"net_type": np.array(net_type)}
    cin = 3
    keys = jax.random.split(key, len(layers) + len(taps))
    for i, ((k, _, _, _), cout) in enumerate(zip(layers, channels)):
        params[f"conv{i}_kernel"] = np.asarray(
            jax.random.normal(keys[i], (k, k, cin, cout)) * 0.05, np.float32
        )
        params[f"conv{i}_bias"] = np.zeros((cout,), np.float32)
        cin = cout
    for j, t in enumerate(taps):
        params[f"lin{j}"] = np.abs(
            np.asarray(
                jax.random.normal(keys[len(layers) + j], (channels[t],)),
                np.float32,
            )
        )
    return params


def load_lpips_params(path: str) -> Dict[str, np.ndarray]:
    data = np.load(path, allow_pickle=False)
    params = {k: data[k] for k in data.files}
    if "net_type" not in params:
        raise ValueError(f"{path} is not an LPIPS weight file (no net_type)")
    return params


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _features(params, x, net_type: str) -> List[jnp.ndarray]:
    layers, _, taps = _arch(net_type)
    feats = []
    for i, (k, stride, pad, pool_before) in enumerate(layers):
        if pool_before:
            x = _maxpool(x)
        x = jax.lax.conv_general_dilated(
            x,
            jnp.asarray(params[f"conv{i}_kernel"]),
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(params[f"conv{i}_bias"])
        x = jax.nn.relu(x)
        if i in taps:
            feats.append(x)
    return feats


def _unit_normalize(x, eps=1e-10):
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + eps)


@functools.partial(jax.jit, static_argnames=("net_type",))
def _lpips_impl(params, image, target, net_type):
    def prep(img):
        img = jnp.asarray(img, jnp.float32) * 2.0 - 1.0  # [0,1] -> [-1,1]
        img = (img - _SHIFT) / _SCALE
        return img[None]  # NHWC

    fa = _features(params, prep(image), net_type)
    fb = _features(params, prep(target), net_type)
    total = jnp.float32(0.0)
    for j, (a, b) in enumerate(zip(fa, fb)):
        d = jnp.square(_unit_normalize(a) - _unit_normalize(b))
        w = jnp.asarray(params[f"lin{j}"])
        total = total + jnp.mean(jnp.sum(d * w, axis=-1))
    return total


def lpips(params: Dict[str, np.ndarray], image, target) -> jnp.ndarray:
    """LPIPS distance between two ``[H, W, 3]`` images in [0, 1].

    Images must be at least 32x32 — below that the backbone's pooled
    feature maps collapse to zero size (the torch implementation has the
    same constraint).
    """
    if min(image.shape[0], image.shape[1]) < 32:
        raise ValueError(
            f"LPIPS needs images >= 32x32, got {image.shape[:2]}"
        )
    net_type = str(np.asarray(params["net_type"]))
    hashable = {k: v for k, v in params.items() if k != "net_type"}
    return _lpips_impl(hashable, image, target, net_type)


def export_lpips_weights(
    path: str, net_type: str = "alex"
):  # pragma: no cover - needs pretrained torch weights (egress)
    """Convert the ``lpips`` package's pretrained weights to the npz schema.

    Run once on a machine with internet access; ship the npz alongside the
    dataset. Falls back to torchvision layer naming when the ``lpips``
    package is unavailable.
    """
    import lpips as lpips_pkg  # type: ignore
    import torch

    net = lpips_pkg.LPIPS(net=net_type)
    layers, channels, taps = _arch(net_type)
    params: Dict[str, np.ndarray] = {"net_type": np.array(net_type)}
    convs = [
        m for m in net.net.modules() if isinstance(m, torch.nn.Conv2d)
    ]
    assert len(convs) == len(layers), (len(convs), len(layers))
    for i, conv in enumerate(convs):
        # torch OIHW -> HWIO
        params[f"conv{i}_kernel"] = (
            conv.weight.detach().permute(2, 3, 1, 0).numpy()
        )
        params[f"conv{i}_bias"] = conv.bias.detach().numpy()
    for j in range(len(taps)):
        lin = getattr(net, f"lin{j}").model[-1]
        params[f"lin{j}"] = lin.weight.detach().numpy().reshape(-1)
    np.savez(path, **params)
    return path
