"""Volume rendering: weights and RGB/accumulation/depth accumulators.

jnp equivalents of nerfstudio's ``RaySamples.get_weights`` and the
``RGBRenderer`` / ``AccumulationRenderer`` / ``DepthRenderer`` stack used
by the reference model (``tetranerf/nerfstudio/model.py:632-638``).
"""

from __future__ import annotations

import jax.numpy as jnp


def render_weights(densities, deltas):
    """Volume-rendering weights from densities and segment lengths.

    ``w_i = (1 - exp(-σ_i δ_i)) · exp(-Σ_{j<i} σ_j δ_j)``
    """
    delta_density = deltas * densities
    alphas = 1.0 - jnp.exp(-delta_density)
    shifted = jnp.concatenate(
        [jnp.zeros_like(delta_density[..., :1]), delta_density[..., :-1]],
        axis=-1,
    )
    transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    return alphas * transmittance


def accumulate_along_rays(weights, values=None):
    if values is None:
        return jnp.sum(weights, axis=-1)
    return jnp.einsum("...s,...sc->...c", weights, values)


def render_rgb_depth_acc(
    weights,
    rgb,
    distances,
    background_rgb=None,
    depth_method: str = "median",
    far: float | None = None,
):
    """Composite per-sample colors into per-ray RGB, accumulation, depth.

    ``depth_method='median'`` matches nerfstudio's default DepthRenderer
    (distance where accumulated weight crosses 0.5); ``'expected'`` is the
    weight-average alternative.
    """
    acc = accumulate_along_rays(weights)  # [R]
    out_rgb = accumulate_along_rays(weights, rgb)  # [R, 3]
    if background_rgb is not None:
        out_rgb = out_rgb + (1.0 - acc[..., None]) * background_rgb
    if depth_method == "median":
        cum = jnp.cumsum(weights, axis=-1)
        idx = jnp.sum((cum < 0.5).astype(jnp.int32), axis=-1, keepdims=True)
        idx = jnp.clip(idx, 0, distances.shape[-1] - 1)
        depth = jnp.take_along_axis(distances, idx, axis=-1)[..., 0]
    elif depth_method == "expected":
        eps = 1e-10
        depth = accumulate_along_rays(weights, distances[..., None])[..., 0]
        depth = depth / jnp.maximum(acc, eps)
        depth = jnp.clip(depth, distances.min(axis=-1), distances.max(axis=-1))
    else:
        raise ValueError(f"unknown depth method {depth_method!r}")
    if far is not None:
        depth = jnp.where(acc > 0.0, depth, far)
    return out_rgb, acc, depth
