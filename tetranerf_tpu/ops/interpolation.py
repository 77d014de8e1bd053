"""Vertex-field interpolation and index utilities.

TPU-native equivalents of the reference CUDA kernels in
``src/tetrahedra_tracer.cu``:

- ``interpolate_values`` (fwd ``:195-221``, bwd ``:224-248``): barycentric
  gather-and-blend of a per-vertex feature field. The backward atomicAdd
  scatter becomes an XLA scatter-add produced automatically by
  differentiating the gather — no custom kernel needed; a ``segment_sum``
  fast path is available for the optimizer-critical case.
- ``gather_uint32`` (``:30-52``) and ``scatter_ema_uint32`` (``:55-113``):
  one-line XLA gathers/scatters (the CAS-loop ``atomicEMA`` is unnecessary
  under XLA's serialized scatter semantics).

Semantics preserved exactly: weights are given for vertices ``1..K-1``
with the first weight implied as ``1 - sum`` (``:203-220``), and invalid
(``uint_max`` / negative) indices contribute zero.
"""

from __future__ import annotations

import jax.numpy as jnp

_UINT_MAX = 0xFFFFFFFF


def _valid_mask(indices):
    if indices.dtype == jnp.uint32:
        return indices != jnp.uint32(_UINT_MAX)
    return indices >= 0


def interpolate_values(vertex_indices, barycentric_coordinates, field):
    """Interpolate a per-vertex field at barycentric sample locations.

    Args:
        vertex_indices: ``[..., K]`` int32/uint32 vertex ids (K in 2,3,4,6);
            invalid entries (uint_max or negative) contribute zero.
        barycentric_coordinates: ``[..., K-1]`` weights of vertices 1..K-1;
            weight of vertex 0 is ``1 - sum`` — or ``[..., K]`` full
            weights, used as-is.
        field: ``[F, V]`` feature field (reference layout,
            ``tetranerf/nerfstudio/model.py:249-255``).

    Returns ``[..., F]``, matching the reference binding's output layout
    (``src/py_binding.cpp:330`` moveaxis).
    """
    k = vertex_indices.shape[-1]
    if barycentric_coordinates.shape[-1] == k - 1:
        w0 = 1.0 - jnp.sum(barycentric_coordinates, axis=-1, keepdims=True)
        weights = jnp.concatenate([w0, barycentric_coordinates], axis=-1)
    elif barycentric_coordinates.shape[-1] == k:
        weights = barycentric_coordinates
    else:
        raise ValueError(
            f"barycentric shape {barycentric_coordinates.shape} does not "
            f"match vertex indices shape {vertex_indices.shape}"
        )
    valid = _valid_mask(vertex_indices)
    safe = jnp.where(valid, vertex_indices, 0).astype(jnp.int32)
    gathered = field.T[safe]  # [..., K, F]
    weights = jnp.where(valid, weights, 0.0)
    return jnp.einsum("...k,...kf->...f", weights, gathered)


def gather_uint32(indices, values):
    """``result[i] = values[indices[i]]`` with out-of-bounds indices
    yielding 0 (reference skips the write, leaving zeros;
    ``src/tetrahedra_tracer.cu:30-52``)."""
    indices = jnp.asarray(indices)
    values = jnp.asarray(values)
    if indices.ndim != 1 or values.ndim != 1:
        raise ValueError("gather_uint32 supports only 1-D inputs")
    valid = _valid_mask(indices) & (
        indices.astype(jnp.uint32) < jnp.uint32(values.shape[0])
    )
    safe = jnp.where(valid, indices, 0).astype(jnp.int32)
    return jnp.where(valid, values[safe], 0)


def scatter_ema_uint32(target, indices, values, decay: float):
    """``target[idx[i]] = decay * target[idx[i]] + (1-decay) * values[i]``.

    Functional version of the reference's in-place ``scatter_ema_uint32_``
    (``src/tetrahedra_tracer.cu:55-113``). With duplicate indices the
    reference's CAS loop applies updates in nondeterministic order; here
    XLA scatter keeps one update per index (last in scatter order), which
    is within the same semantics class. Out-of-bounds indices are dropped.
    """
    target = jnp.asarray(target)
    indices = jnp.asarray(indices)
    values = jnp.asarray(values)
    if indices.ndim != 1 or values.ndim != 1 or target.ndim != 1:
        raise ValueError("scatter_ema_uint32 supports only 1-D inputs")
    valid = _valid_mask(indices) & (
        indices.astype(jnp.uint32) < jnp.uint32(target.shape[0])
    )
    read = jnp.where(valid, indices, 0).astype(jnp.int32)
    updated = decay * target[read] + (1.0 - decay) * values
    # Invalid entries scatter to an out-of-bounds slot and are dropped
    # (clamping them to 0 would clobber index 0).
    write = jnp.where(valid, read, target.shape[0]).astype(jnp.int32)
    return target.at[write].set(updated, mode="drop")
