"""Pallas TPU kernels for the sampling hot path.

Two custom-VJP ops, both built on the same idea: the selection/blend
matrices that turn traversal structure into per-sample features are tiny,
ray-local, and cheap to (re)build in VMEM — so they must never be
materialized in HBM (the XLA formulation spends ~1.5 GB of HBM traffic +
residency per step on them at 8192 rays).

1. :func:`interp_endpoints` — per-sample lerp of interval-endpoint
   features: ``out[s] = (1-frac_s)·feats[k_s] + frac_s·feats[k_s+1]``.
   Replaces the reference's per-sample CUDA gather+lerp
   (``src/tetrahedra_tracer.cu:195-265``).
2. :func:`stream_blend` — endpoint features from the march's deduplicated
   per-ray vertex stream: ``out[e] = Σ_j bary[e,j] · stream[pos[e,j]]``.
   The transpose (backward) accumulates endpoint gradients back onto the
   stream rows entirely in VMEM — the global HBM scatter then touches one
   row per *unique* (ray, vertex) instead of four rows per endpoint.

Both kernels build the weight matrix TRANSPOSED — ``[contraction dim
(sublanes), output dim (lanes)]`` — so the one-hot construction only
broadcasts ``[1, N]`` rows against sublane iotas (no lane→sublane
relayouts, which Mosaic handles poorly), and run the contraction on the
MXU in bfloat16 (the model's compute dtype).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _block_rays(num_rays: int) -> int:
    for rb in (8, 4, 2, 1):
        if num_rays % rb == 0:
            return rb
    return 1


# --------------------------------------------------------------------------
# interp_endpoints: samples <- endpoint features
# --------------------------------------------------------------------------


def _wt(k_row, frac_row, n_end):
    """Transposed lerp weights ``w_T [n_end, S]`` from ``[1, S]`` rows."""
    n_samples = k_row.shape[-1]
    slots = jax.lax.broadcasted_iota(jnp.int32, (n_end, n_samples), 0)
    return jnp.where(slots == k_row, 1.0 - frac_row, 0.0) + jnp.where(
        slots == k_row + 1, frac_row, 0.0
    )


def _interp_fwd_kernel(k_ref, frac_ref, feats_ref, out_ref):
    """out[r] = w^T-contraction: [T+1,S]^T x [T+1,F] -> [S,F]."""
    rb = k_ref.shape[0]
    n_end = feats_ref.shape[1]

    def body(r, _):
        w_t = _wt(k_ref[pl.ds(r, 1), :], frac_ref[pl.ds(r, 1), :], n_end)
        out_ref[r, :, :] = jax.lax.dot_general(
            w_t.astype(jnp.bfloat16),
            feats_ref[r, :, :].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, rb, body, 0)


def _interp_bwd_kernel(k_ref, frac_ref, g_ref, gfeats_ref):
    """gfeats[r] = w_T @ g: [T+1,S] x [S,F] -> [T+1,F]."""
    rb = k_ref.shape[0]
    n_end = gfeats_ref.shape[1]

    def body(r, _):
        w_t = _wt(k_ref[pl.ds(r, 1), :], frac_ref[pl.ds(r, 1), :], n_end)
        gfeats_ref[r, :, :] = jax.lax.dot_general(
            w_t.astype(jnp.bfloat16),
            g_ref[r, :, :].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, rb, body, 0)


def _run_interp(kernel, k, frac, mat, n_out, interpret):
    num_rays, n_samples = k.shape
    n_in, feat = mat.shape[1], mat.shape[2]
    rb = _block_rays(num_rays)
    return pl.pallas_call(
        kernel,
        grid=(num_rays // rb,),
        in_specs=[
            pl.BlockSpec((rb, n_samples), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, n_samples), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rb, n_in, feat), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (rb, n_out, feat), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_rays, n_out, feat), jnp.float32),
        interpret=interpret,
    )(k, frac, mat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def interp_endpoints(feats, k, frac, interpret=None):
    """``out[r, s] = (1-frac)*feats[r, k] + frac*feats[r, k+1]``.

    ``feats f32[R, T+1, F]``, ``k i32[R, S]`` (clipped to [0, T-1]),
    ``frac f32[R, S]`` in [0, 1]. Invalid samples must be encoded by the
    caller as ``frac=0`` + any in-range ``k`` and masked downstream; this
    op is linear in ``feats`` only — ``k``/``frac`` take no gradient.
    """
    interpret = not _on_tpu() if interpret is None else interpret
    return _run_interp(
        _interp_fwd_kernel, k, frac, feats, k.shape[1], interpret
    )


def _interp_fwd(feats, k, frac, interpret):
    return interp_endpoints(feats, k, frac, interpret), (k, frac, feats.shape[1])


def _interp_bwd(interpret, residuals, g):
    k, frac, n_end = residuals
    interpret = not _on_tpu() if interpret is None else interpret
    gfeats = _run_interp(_interp_bwd_kernel, k, frac, g, n_end, interpret)
    return gfeats, None, None


interp_endpoints.defvjp(_interp_fwd, _interp_bwd)


# --------------------------------------------------------------------------
# stream_blend: endpoint features <- deduplicated vertex stream
# --------------------------------------------------------------------------


def _bt(pos_refs, bary_refs, r, n_stream):
    """Transposed blend matrix ``B_T [n_stream, E]`` for ray ``r``.

    ``B[e, u] = Σ_j bary[e, j] · 1[pos[e, j] == u]`` — built from four
    ``[1, E]`` row broadcasts against a sublane iota.
    """
    n_end = pos_refs[0].shape[1]
    slots = jax.lax.broadcasted_iota(jnp.int32, (n_stream, n_end), 0)
    b_t = jnp.zeros((n_stream, n_end), jnp.float32)
    for pos_ref, bary_ref in zip(pos_refs, bary_refs):
        b_t = b_t + jnp.where(
            slots == pos_ref[pl.ds(r, 1), :], bary_ref[pl.ds(r, 1), :], 0.0
        )
    return b_t


def _blend_fwd_kernel(p0, p1, p2, p3, b0, b1, b2, b3, sf_ref, out_ref):
    """out[r] = B @ sf = B_T^T-contraction: [U,E]^T x [U,F] -> [E,F]."""
    rb = p0.shape[0]
    n_stream = sf_ref.shape[1]

    def body(r, _):
        b_t = _bt((p0, p1, p2, p3), (b0, b1, b2, b3), r, n_stream)
        out_ref[r, :, :] = jax.lax.dot_general(
            b_t.astype(jnp.bfloat16),
            sf_ref[r, :, :].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, rb, body, 0)


def _blend_bwd_kernel(p0, p1, p2, p3, b0, b1, b2, b3, g_ref, gsf_ref):
    """gsf[r] = B^T @ g = B_T @ g: [U,E] x [E,F] -> [U,F]."""
    rb = p0.shape[0]
    n_stream = gsf_ref.shape[1]

    def body(r, _):
        b_t = _bt((p0, p1, p2, p3), (b0, b1, b2, b3), r, n_stream)
        gsf_ref[r, :, :] = jax.lax.dot_general(
            b_t.astype(jnp.bfloat16),
            g_ref[r, :, :].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(gsf_ref.dtype)
        return 0

    jax.lax.fori_loop(0, rb, body, 0)


def _run_blend(kernel, pos, bary, mat, n_out, interpret, out_dtype=None):
    num_rays, n_end = pos.shape[:2]
    n_in, feat = mat.shape[1], mat.shape[2]
    rb = _block_rays(num_rays)
    vec_spec = pl.BlockSpec((rb, n_end), lambda g: (g, 0), memory_space=pltpu.VMEM)
    args = [pos[:, :, j] for j in range(4)] + [bary[:, :, j] for j in range(4)]
    return pl.pallas_call(
        kernel,
        grid=(num_rays // rb,),
        in_specs=[vec_spec] * 8
        + [
            pl.BlockSpec(
                (rb, n_in, feat), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (rb, n_out, feat), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_rays, n_out, feat), out_dtype or jnp.float32
        ),
        interpret=interpret,
    )(*args, mat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def stream_blend(stream_field, pos, bary, interpret=None):
    """``out[r, e] = Σ_j bary[r, e, j] · stream_field[r, pos[r, e, j]]``.

    ``stream_field f32[R, U, F]`` (per-ray deduplicated vertex feature
    rows), ``pos i32[R, E, 4]`` in [0, U), ``bary f32[R, E, 4]``. Invalid
    endpoints must carry ``bary = 0``. Linear in ``stream_field``;
    ``pos``/``bary`` take no gradient (the model's geometry is
    stop-gradiented, as in the reference — it optimizes the field only).
    """
    interpret = not _on_tpu() if interpret is None else interpret
    return _run_blend(
        _blend_fwd_kernel, pos, bary, stream_field, pos.shape[1], interpret
    )


def _blend_fwd(stream_field, pos, bary, interpret):
    out = stream_blend(stream_field, pos, bary, interpret)
    # The primal's dtype rides the residuals as a 0-size array (a bare
    # np.dtype is not a valid JAX residual leaf).
    dtype_tok = jnp.zeros((0,), stream_field.dtype)
    return out, (pos, bary, stream_field.shape[1], dtype_tok)


def _blend_bwd(interpret, residuals, g):
    # The cotangent is emitted in the PRIMAL's dtype — both a custom_vjp
    # requirement and the point of a bf16 stream (``ops/fused.
    # gather_rows_lowp``): the kernel writes half the gradient-row bytes
    # and the downstream field scatter reads them at half width.
    pos, bary, n_stream, dtype_tok = residuals
    interpret = not _on_tpu() if interpret is None else interpret
    gsf = _run_blend(
        _blend_bwd_kernel, pos, bary, g, n_stream, interpret,
        out_dtype=dtype_tok.dtype,
    )
    return gsf, None, None


stream_blend.defvjp(_blend_fwd, _blend_bwd)
