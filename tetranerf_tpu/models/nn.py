"""Minimal functional NN building blocks (pytree params, no framework).

Mirrors the reference's nerfstudio ``MLP`` / ``RGBFieldHead`` /
``DensityFieldHead`` stack (``tetranerf/nerfstudio/model.py:433-455``)
with torch-Linear-style initialization (U(-1/sqrt(fan_in), +1/sqrt(fan_in))
for both weight and bias) so training dynamics are comparable.

Parameters are plain dicts of arrays — easy to checkpoint, shard, and
donate. Compute runs in ``compute_dtype`` (bfloat16 on TPU by default at
the model level) while parameters stay float32.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> Params:
    bound = 1.0 / math.sqrt(in_dim)
    wkey, bkey = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(
            wkey, (in_dim, out_dim), dtype, minval=-bound, maxval=bound
        ),
        "bias": jax.random.uniform(
            bkey, (out_dim,), dtype, minval=-bound, maxval=bound
        ),
    }


def linear_apply(params: Params, x, compute_dtype=None, out_dtype=None):
    """``x @ kernel + bias`` with f32 MXU accumulation.

    ``out_dtype`` stores the result (and therefore the layer-boundary
    tensor AND its backward cotangent) in a narrower dtype; the matmul
    still accumulates in f32 on the MXU. At NeRF sample counts the MLP
    stack is HBM-boundary-bound, not FLOP-bound — bf16 boundaries halve
    its traffic in both passes."""
    kernel = params["kernel"]
    bias = params["bias"]
    if compute_dtype is not None:
        kernel = kernel.astype(compute_dtype)
        bias = bias.astype(compute_dtype)
        x = x.astype(compute_dtype)
    out = jnp.dot(x, kernel, preferred_element_type=jnp.float32) + bias
    if out_dtype is not None:
        out = out.astype(out_dtype)
    return out


def mlp_init(
    key, in_dim: int, num_layers: int, width: int, out_dim: int | None = None
) -> List[Params]:
    """nerfstudio-MLP layout: ``num_layers`` Linear layers with ReLU
    between them; a single layer maps in_dim -> out_dim directly."""
    out_dim = out_dim if out_dim is not None else width
    dims: Sequence[int]
    if num_layers == 1:
        dims = [in_dim, out_dim]
    else:
        dims = [in_dim] + [width] * (num_layers - 1) + [out_dim]
    keys = jax.random.split(key, len(dims) - 1)
    return [
        linear_init(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)
    ]


def mlp_apply(
    params: List[Params], x, out_activation=None, compute_dtype=None,
    final_dtype=None,
):
    """Hidden-layer boundaries are stored in ``compute_dtype`` (see
    :func:`linear_apply`). ``final_dtype`` controls the last layer's
    boundary: pass ``compute_dtype`` when the consumer is another
    reduced-precision MLP (trunk outputs); leave ``None`` (f32) when it
    feeds a head nonlinearity / the renderer."""
    for i, layer in enumerate(params):
        hidden = i + 1 < len(params)
        x = linear_apply(
            layer, x, compute_dtype,
            out_dtype=compute_dtype if hidden else final_dtype,
        )
        if hidden:
            x = jax.nn.relu(x)
    if out_activation is not None:
        x = out_activation(x)
    return x
