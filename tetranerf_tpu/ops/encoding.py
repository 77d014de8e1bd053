"""Positional (NeRF) encodings.

Port of nerfstudio's ``NeRFEncoding`` as instantiated by the reference
(``tetranerf/nerfstudio/model.py:416-432``): inputs scaled by 2π,
frequencies ``2**linspace(min_exp, max_exp, num)``, interleaved
sin/cos (sin of scaled and scaled+π/2), optional raw-input append.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def nerf_encoding(
    x,
    num_frequencies: int,
    min_freq_exp: float = 0.0,
    max_freq_exp: float | None = None,
    include_input: bool = True,
):
    if num_frequencies == 0:
        return x
    if max_freq_exp is None:
        max_freq_exp = float(num_frequencies)
    freqs = 2.0 ** jnp.linspace(
        min_freq_exp, max_freq_exp, num_frequencies, dtype=x.dtype
    )
    scaled = 2.0 * math.pi * x
    s = scaled[..., None] * freqs  # [..., D, F]
    s = s.reshape(*s.shape[:-2], -1)  # [..., D*F]
    encoded = jnp.sin(jnp.concatenate([s, s + math.pi / 2.0], axis=-1))
    if include_input:
        encoded = jnp.concatenate([encoded, x], axis=-1)
    return encoded


def nerf_encoding_dim(
    in_dim: int, num_frequencies: int, include_input: bool = True
) -> int:
    if num_frequencies == 0:
        return in_dim
    return in_dim * num_frequencies * 2 + (in_dim if include_input else 0)
