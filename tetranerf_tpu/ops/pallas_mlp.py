"""Fully-fused field MLPs (base + density + color heads) as one Pallas kernel.

Why: the field MLPs are tiny in FLOPs (~0.1 MFLOP/sample) but XLA
materializes every [R, S, 128] activation in HBM — ~0.5 GB per tensor at
8192x256 samples, ~6 tensors per pass, re-read by the backward. Measured
on v5e that is ~58 ms of a 168 ms train step while the MXU is >90% idle.
The fix is the same one the CUDA world uses (tiny-cuda-nn's fully-fused
MLP, which the reference ecosystem relies on for this exact network
shape): all weights (~270 KB) live in VMEM, a block of samples flows
through the whole layer chain without its activations ever touching HBM,
and only the input features and the 4 output channels cross the membrane.

Forward: one grid step processes ``rb`` rays x ``S`` samples as a single
``[rb*S, .]`` matmul chain (bf16 operands, f32 accumulation — the same
precision contract as :func:`tetranerf_tpu.models.nn.linear_apply`).

Backward (``jax.custom_vjp``): recomputes the activations per block (the
recompute is nearly free — it is exactly the forward) and accumulates
weight/bias gradients in f32 VMEM across the sequential TPU grid,
emitting ``dx`` and the per-ray ``dhead_dir`` blockwise.

The per-ray head input (direction encoding [+ appearance embedding] +
first head-layer bias) enters as a precomputed ``head_dir = dir_enc @
W_head[:27] + ... + b_head`` — per-RAY, so computing it outside the
kernel costs [R, H] not [R, S, H]; inside the kernel it broadcasts over
the sample axis. Gradients flow back through ``dhead_dir`` to the sliced
weight rows by plain autodiff.

Replaces the reference's per-sample torch MLP stack
(``tetranerf/nerfstudio/model.py:433-455, 602-621``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_interp import _on_tpu


def _mkdot(dims, dtype):
    """MXU matmul in ``dtype`` with f32 accumulation (linear_apply's
    contract). f32 operands force full precision so TPU does not
    decompose the matmul into bf16 passes."""
    dtype = jnp.dtype(dtype)
    precision = (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def dot(a, b):
        return jax.lax.dot_general(
            a.astype(dtype),
            b.astype(dtype),
            dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    return dot


def _forward_chain(x2, hd2, weights, n_base, n_head, dtype):
    """The full layer chain on a flat [N, D_in] block.

    Returns (rgb [N,3], density [N,1], activations) where activations =
    (base acts incl. input, head acts, pre_d) — what the backward needs.
    """
    _dot = _mkdot(((1,), (0,)), dtype)
    ws = list(weights)
    base_acts = [x2]
    h = x2
    for _ in range(n_base):
        w, b = ws.pop(0), ws.pop(0)
        h = jax.nn.relu(_dot(h, w) + b[None, :])
        base_acts.append(h)
    wd, bd = ws.pop(0), ws.pop(0)
    pre_d = _dot(h, wd) + bd[None, :]
    density = jax.nn.softplus(pre_d)
    if n_head == 0:  # density-only (the coarse PDF round)
        return None, density, (base_acts, [], pre_d)
    wbh = ws.pop(0)
    head_acts = [jax.nn.relu(_dot(h, wbh) + hd2)]
    for _ in range(n_head - 1):
        w, b = ws.pop(0), ws.pop(0)
        head_acts.append(jax.nn.relu(_dot(head_acts[-1], w) + b[None, :]))
    wc, bc = ws.pop(0), ws.pop(0)
    rgb = jax.nn.sigmoid(_dot(head_acts[-1], wc) + bc[None, :])
    return rgb, density, (base_acts, head_acts, pre_d)


def _fwd_kernel(n_base, n_head, dtype, x_ref, hd_ref, *refs):
    *w_refs, rgb_ref, dens_ref = refs
    rb, s, d_in = x_ref.shape
    x2 = x_ref[...].reshape(rb * s, d_in)
    hd2 = jnp.broadcast_to(
        hd_ref[...][:, None, :], (rb, s, hd_ref.shape[-1])
    ).reshape(rb * s, hd_ref.shape[-1])
    weights = [r[...] for r in w_refs]
    rgb, density, _ = _forward_chain(
        x2, hd2, weights, n_base, n_head, dtype
    )
    rgb_ref[...] = rgb.reshape(rb, s, 3)
    dens_ref[...] = density.reshape(rb, s, 1)


def _bwd_kernel(n_base, n_head, dtype, x_ref, hd_ref, *refs):
    n_w = 2 * n_base + 2 + 1 + 2 * (n_head - 1) + 2
    w_refs = refs[:n_w]
    g_rgb_ref, g_dens_ref = refs[n_w : n_w + 2]
    dx_ref, dhd_ref = refs[n_w + 2 : n_w + 4]
    dw_refs = refs[n_w + 4 :]
    rb, s, d_in = x_ref.shape
    hdim = hd_ref.shape[-1]
    x2 = x_ref[...].reshape(rb * s, d_in)
    hd2 = jnp.broadcast_to(
        hd_ref[...][:, None, :], (rb, s, hdim)
    ).reshape(rb * s, hdim)
    weights = [r[...] for r in w_refs]
    rgb, _, (base_acts, head_acts, pre_d) = _forward_chain(
        x2, hd2, weights, n_base, n_head, dtype
    )
    _dot_t = _mkdot(((1,), (1,)), dtype)  # g @ w^T (contract lanes)
    _dot_acc = _mkdot(((0,), (0,)), dtype)  # a^T @ g (contract samples)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dw_refs:
            r[...] = jnp.zeros_like(r)

    ws = list(weights)
    base_ws = [(ws.pop(0), ws.pop(0)) for _ in range(n_base)]
    wd, _bd = ws.pop(0), ws.pop(0)
    wbh = ws.pop(0)
    head_ws = [(ws.pop(0), ws.pop(0)) for _ in range(n_head - 1)]
    wc, _bc = ws.pop(0), ws.pop(0)

    grads = []  # same order as w_refs
    g_rgb = g_rgb_ref[...].reshape(rb * s, 3)
    g_dens = g_dens_ref[...].reshape(rb * s, 1)

    # Color head: rgb = sigmoid(pre_c).
    g_pre = g_rgb * rgb * (1.0 - rgb)
    dwc = _dot_acc(head_acts[-1], g_pre)
    dbc = jnp.sum(g_pre, axis=0, keepdims=True)
    g = _dot_t(g_pre, wc)
    # Head layers (beyond the first), reversed.
    for i in range(n_head - 2, -1, -1):
        w, _ = head_ws[i]
        g_pre = g * (head_acts[i + 1] > 0.0)
        grads.append(jnp.sum(g_pre, axis=0, keepdims=True))  # db
        grads.append(_dot_acc(head_acts[i], g_pre))  # dw
        g = _dot_t(g_pre, w)
    # First head layer (per-ray head_dir enters additively here).
    g_pre = g * (head_acts[0] > 0.0)
    dwbh = _dot_acc(base_acts[-1], g_pre)
    dhd_ref[...] = jnp.sum(g_pre.reshape(rb, s, hdim), axis=1)
    g_base = _dot_t(g_pre, wbh)
    # Density head.
    g_pre_d = g_dens * jax.nn.sigmoid(pre_d)
    dwd = _dot_acc(base_acts[-1], g_pre_d)
    dbd = jnp.sum(g_pre_d, axis=0, keepdims=True)
    g_base = g_base + _dot_t(g_pre_d, wd)
    # Base MLP, reversed.
    g = g_base
    base_grads = []
    for i in range(n_base - 1, -1, -1):
        w, _ = base_ws[i]
        g_pre = g * (base_acts[i + 1] > 0.0)
        base_grads.append(jnp.sum(g_pre, axis=0, keepdims=True))  # db
        base_grads.append(_dot_acc(base_acts[i], g_pre))  # dw
        g = _dot_t(g_pre, w)
    dx_ref[...] = g.reshape(rb, s, d_in)

    # Accumulate into the grad outputs in w_refs order:
    # base (w, b)*, (wd, bd), wbh, head (w, b)*, (wc, bc).
    ordered = []
    for i in range(n_base):
        dw = base_grads[2 * (n_base - 1 - i) + 1]
        db = base_grads[2 * (n_base - 1 - i)]
        ordered += [dw, db]
    ordered += [dwd, dbd, dwbh]
    for i in range(n_head - 1):
        dw = grads[2 * (n_head - 2 - i) + 1]
        db = grads[2 * (n_head - 2 - i)]
        ordered += [dw, db]
    ordered += [dwc, dbc]
    for r, gval in zip(dw_refs, ordered):
        r[...] += gval.reshape(r.shape)


def _block_shape(num_rays: int, s: int, max_rows: int) -> int:
    """Rays per block: largest rb | num_rays with rb*S <= max_rows.

    Mosaic needs the sublane dim of 2-D blocks ([rb, H] head_dir) to be
    a multiple of 8 — or the whole array; small/odd ray counts fall back
    to a single full-array block."""
    for rb in (32, 16, 8):
        if num_rays % rb == 0 and rb * s <= max_rows:
            return rb
    return num_rays


# The backward holds the recomputed activation chain (~8 [N, 128] f32
# tensors + their bf16/transposed copies) on the Mosaic value stack, so
# its block must be smaller than the forward's; both get an explicit
# VMEM budget above the 16MB default (v5e/v5p have 128MB/core).
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _w_spec(w):
    nd = w.ndim
    return pl.BlockSpec(w.shape, lambda g, _n=nd: (0,) * _n,
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_field_mlps(static, x, head_dir, *weights):
    """rgb/density heads over samples, fused into one Pallas program.

    ``static = (n_base, n_head, compute_dtype, interpret)``.
    ``x f32[R, S, D_in]``
    (interpolated field features), ``head_dir f32[R, H]`` (per-ray
    first-head-layer contribution: direction encoding [+ appearance]
    matmul + bias). ``weights`` flat: base ``(W, b)`` pairs, density
    ``(W[H,1], b)``, ``W_base_head [H, H]`` (first head layer's
    base-feature rows; its bias and direction rows live in ``head_dir``),
    remaining head ``(W, b)`` pairs, color ``(W[H,3], b)``.

    Returns ``(rgb f32[R, S, 3], density f32[R, S, 1])`` with sigmoid /
    softplus applied — matching ``TetraNerf._field_mlps``
    (``tetranerf/nerfstudio/model.py:602-621`` semantics).
    """
    n_base, n_head, dtype, interpret = static
    interpret = not _on_tpu() if interpret is None else interpret
    num_rays, s, d_in = x.shape
    rb = _block_shape(num_rays, s, 4096)
    kern = functools.partial(_fwd_kernel, n_base, n_head, dtype)
    rgb, dens = pl.pallas_call(
        kern,
        grid=(num_rays // rb,),
        in_specs=[
            pl.BlockSpec((rb, s, d_in), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, head_dir.shape[-1]), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [_w_spec(w) for w in weights],
        out_specs=[
            pl.BlockSpec((rb, s, 3), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, s, 1), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_rays, s, 3), jnp.float32),
            jax.ShapeDtypeStruct((num_rays, s, 1), jnp.float32),
        ],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(x, head_dir, *weights)
    return rgb, dens


def _fused_fwd(static, x, head_dir, *weights):
    out = fused_field_mlps(static, x, head_dir, *weights)
    return out, (x, head_dir, weights)


def _fused_bwd(static, residuals, cotangents):
    n_base, n_head, dtype, interpret = static
    interpret = not _on_tpu() if interpret is None else interpret
    x, head_dir, weights = residuals
    g_rgb, g_dens = cotangents
    num_rays, s, d_in = x.shape
    rb = _block_shape(num_rays, s, 4096)
    kern = functools.partial(_bwd_kernel, n_base, n_head, dtype)
    # Bias grads accumulate as [1, dim] rows; reshape back after.
    grad_shapes = [
        jax.ShapeDtypeStruct(
            w.shape if w.ndim == 2 else (1, w.shape[0]), jnp.float32
        )
        for w in weights
    ]
    outs = pl.pallas_call(
        kern,
        grid=(num_rays // rb,),
        in_specs=[
            pl.BlockSpec((rb, s, d_in), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, head_dir.shape[-1]), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [_w_spec(w) for w in weights]
        + [
            pl.BlockSpec((rb, s, 3), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, s, 1), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rb, s, d_in), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, head_dir.shape[-1]), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec(gs.shape, lambda g, _n=gs.ndim: (0,) * _n,
                         memory_space=pltpu.VMEM)
            for gs in grad_shapes
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_rays, s, d_in), jnp.float32),
            jax.ShapeDtypeStruct((num_rays, head_dir.shape[-1]), jnp.float32),
        ]
        + grad_shapes,
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(x, head_dir, *weights, g_rgb, g_dens)
    dx, dhd = outs[0], outs[1]
    dws = [
        dg if w.ndim == 2 else dg.reshape(w.shape)
        for w, dg in zip(weights, outs[2:])
    ]
    return (dx, dhd, *dws)


fused_field_mlps.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Density-only variant (the coarse PDF round: rgb is never consumed, so
# the head/color layers — ~40% of the FLOPs — are skipped in BOTH passes;
# the XLA path gets this for free from DCE, an opaque kernel must not
# recompute them).
# ---------------------------------------------------------------------------


def _dens_fwd_kernel(n_base, dtype, x_ref, *refs):
    *w_refs, dens_ref = refs
    rb, s, d_in = x_ref.shape
    x2 = x_ref[...].reshape(rb * s, d_in)
    weights = [r[...] for r in w_refs]
    _, density, _ = _forward_chain(x2, None, weights, n_base, 0, dtype)
    dens_ref[...] = density.reshape(rb, s, 1)


def _dens_bwd_kernel(n_base, dtype, x_ref, *refs):
    n_w = 2 * n_base + 2
    w_refs = refs[:n_w]
    g_dens_ref = refs[n_w]
    dx_ref = refs[n_w + 1]
    dw_refs = refs[n_w + 2 :]
    rb, s, d_in = x_ref.shape
    x2 = x_ref[...].reshape(rb * s, d_in)
    weights = [r[...] for r in w_refs]
    _, _, (base_acts, _, pre_d) = _forward_chain(
        x2, None, weights, n_base, 0, dtype
    )
    _dot_t = _mkdot(((1,), (1,)), dtype)
    _dot_acc = _mkdot(((0,), (0,)), dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dw_refs:
            r[...] = jnp.zeros_like(r)

    ws = list(weights)
    base_ws = [(ws.pop(0), ws.pop(0)) for _ in range(n_base)]
    wd, _bd = ws.pop(0), ws.pop(0)

    g_dens = g_dens_ref[...].reshape(rb * s, 1)
    g_pre_d = g_dens * jax.nn.sigmoid(pre_d)
    dwd = _dot_acc(base_acts[-1], g_pre_d)
    dbd = jnp.sum(g_pre_d, axis=0, keepdims=True)
    g = _dot_t(g_pre_d, wd)
    base_grads = []
    for i in range(n_base - 1, -1, -1):
        w, _ = base_ws[i]
        g_pre = g * (base_acts[i + 1] > 0.0)
        base_grads.append(jnp.sum(g_pre, axis=0, keepdims=True))
        base_grads.append(_dot_acc(base_acts[i], g_pre))
        g = _dot_t(g_pre, w)
    dx_ref[...] = g.reshape(rb, s, d_in)

    ordered = []
    for i in range(n_base):
        ordered += [
            base_grads[2 * (n_base - 1 - i) + 1],
            base_grads[2 * (n_base - 1 - i)],
        ]
    ordered += [dwd, dbd]
    for r, gval in zip(dw_refs, ordered):
        r[...] += gval.reshape(r.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_density_mlp(static, x, *weights):
    """Density head only: base MLP + softplus(density linear), fused.

    ``static = (n_base, compute_dtype, interpret)``; ``weights`` flat:
    base ``(W, b)`` pairs then density ``(W[H,1], b)``. Returns
    ``density f32[R, S, 1]``.
    """
    n_base, dtype, interpret = static
    interpret = not _on_tpu() if interpret is None else interpret
    num_rays, s, d_in = x.shape
    rb = _block_shape(num_rays, s, 4096)
    kern = functools.partial(_dens_fwd_kernel, n_base, dtype)
    return pl.pallas_call(
        kern,
        grid=(num_rays // rb,),
        in_specs=[
            pl.BlockSpec((rb, s, d_in), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM)
        ]
        + [_w_spec(w) for w in weights],
        out_specs=pl.BlockSpec((rb, s, 1), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_rays, s, 1), jnp.float32),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(x, *weights)


def _dens_fwd(static, x, *weights):
    return fused_density_mlp(static, x, *weights), (x, weights)


def _dens_bwd(static, residuals, g_dens):
    n_base, dtype, interpret = static
    interpret = not _on_tpu() if interpret is None else interpret
    x, weights = residuals
    num_rays, s, d_in = x.shape
    rb = _block_shape(num_rays, s, 4096)
    kern = functools.partial(_dens_bwd_kernel, n_base, dtype)
    grad_shapes = [
        jax.ShapeDtypeStruct(
            w.shape if w.ndim == 2 else (1, w.shape[0]), jnp.float32
        )
        for w in weights
    ]
    outs = pl.pallas_call(
        kern,
        grid=(num_rays // rb,),
        in_specs=[
            pl.BlockSpec((rb, s, d_in), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM)
        ]
        + [_w_spec(w) for w in weights]
        + [
            pl.BlockSpec((rb, s, 1), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((rb, s, d_in), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM)
        ]
        + [
            pl.BlockSpec(gs.shape, lambda g, _n=gs.ndim: (0,) * _n,
                         memory_space=pltpu.VMEM)
            for gs in grad_shapes
        ],
        out_shape=[jax.ShapeDtypeStruct((num_rays, s, d_in), jnp.float32)]
        + grad_shapes,
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(x, *weights, g_dens)
    dx = outs[0]
    dws = [
        dg if w.ndim == 2 else dg.reshape(w.shape)
        for w, dg in zip(weights, outs[1:])
    ]
    return (dx, *dws)


fused_density_mlp.defvjp(_dens_fwd, _dens_bwd)
