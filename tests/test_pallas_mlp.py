"""Fused Pallas MLP stack vs the XLA reference path.

The fused kernel must reproduce ``TetraNerf._field_mlps`` (same bf16
matmul / f32 accumulation contract) in both the forward outputs and the
gradients w.r.t. every parameter and the input features. Tolerances are
bf16-scale: both paths quantize matmul operands to bf16 but may differ
in bias-add precision and reduction order.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetranerf_tpu.models import TetraNerf
from tetranerf_tpu.models.config import TetrahedraNerfConfig


class _Shell(TetraNerf):
    """TetraNerf with the mesh-dependent pieces stubbed out: only the
    MLP stack is exercised."""

    def __init__(self, config):
        self.config = config
        self.num_train_images = 4
        from tetranerf_tpu.ops.encoding import nerf_encoding_dim

        self._mlp_in_dim = nerf_encoding_dim(
            config.field_dim, config.input_fourier_frequencies
        )
        self._dir_enc_dim = nerf_encoding_dim(3, 4)
        self._head_in_dim = (
            config.hidden_size
            + self._dir_enc_dim
            + config.appearance_embed_dim
        )

    def init_mlp_params(self, key):
        from tetranerf_tpu.models import nn

        cfg = self.config
        keys = jax.random.split(key, 5)
        params = {
            "mlp_base": nn.mlp_init(
                keys[0], self._mlp_in_dim, cfg.num_density_layers,
                cfg.hidden_size,
            ),
            "mlp_head": nn.mlp_init(
                keys[1], self._head_in_dim, cfg.num_color_layers,
                cfg.hidden_size,
            ),
            "field_output_color": nn.linear_init(keys[2], cfg.hidden_size, 3),
            "field_output_density": nn.linear_init(
                keys[3], cfg.hidden_size, 1
            ),
        }
        if cfg.appearance_embed_dim > 0:
            params["appearance_embedding"] = jax.random.normal(
                keys[4], (self.num_train_images, cfg.appearance_embed_dim)
            )
        return params


def _setup(r=8, s=16, **cfg_kwargs):
    cfg = TetrahedraNerfConfig(
        num_tetrahedra_vertices=1, num_tetrahedra_cells=1, **cfg_kwargs
    )
    model = _Shell(cfg)
    key = jax.random.PRNGKey(0)
    params = model.init_mlp_params(key)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (r, s, cfg.field_dim), jnp.float32)
    d = jax.random.normal(k2, (r, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    cam = jax.random.randint(k3, (r,), 0, model.num_train_images)
    return model, params, x, d, cam


def _run(model, fused, params, x, d, cam, train=True):
    cfg = dataclasses.replace(model.config, fused_mlps=fused)
    m = _Shell(cfg)
    return m._field_mlps_remat(params, x, d, cam, train)


@pytest.mark.parametrize(
    "cfg_kwargs",
    [
        {},
        {"num_color_layers": 2},
        {"num_density_layers": 1},
        {"appearance_embed_dim": 8},
    ],
    ids=["default", "deep-head", "shallow-base", "appearance"],
)
def test_fused_forward_matches_xla(cfg_kwargs):
    model, params, x, d, cam = _setup(**cfg_kwargs)
    rgb_ref, dens_ref = _run(model, False, params, x, d, cam)
    rgb_f, dens_f = _run(model, True, params, x, d, cam)
    np.testing.assert_allclose(
        np.asarray(rgb_f), np.asarray(rgb_ref), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(dens_f), np.asarray(dens_ref), atol=2e-2, rtol=2e-2
    )


def _grads(model, params, x, d, cam):
    def loss(fused):
        def f(p, xv):
            rgb, dens = _run(model, fused, p, xv, d, cam)
            return jnp.sum(jnp.sin(rgb)) + 0.01 * jnp.sum(jnp.tanh(dens))

        return f

    g_ref, gx_ref = jax.grad(loss(False), argnums=(0, 1))(params, x)
    g_f, gx_f = jax.grad(loss(True), argnums=(0, 1))(params, x)
    ref = jax.tree_util.tree_leaves_with_path(g_ref) + [
        (("x",), gx_ref)
    ]
    fused = jax.tree_util.tree_leaves(g_f) + [gx_f]
    return ref, fused


def test_fused_gradients_match_xla_f32():
    """f32 compute: both paths do full-precision matmuls — a tight
    elementwise bound validates the backward's math (transposes, layer
    chain, blame assignment) exactly."""
    model, params, x, d, cam = _setup(compute_dtype="float32")
    ref, fused = _grads(model, params, x, d, cam)
    for (path, a), b in zip(ref, fused):
        scale = max(1e-3, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b) / scale,
            np.asarray(a) / scale,
            atol=1e-4,
            err_msg=f"grad mismatch at {path}",
        )


def test_fused_gradients_match_xla_bf16():
    """bf16 compute: the fused backward quantizes the cotangent to bf16
    where the CPU XLA path keeps it f32 (on real TPU the XLA path's
    DEFAULT-precision f32 matmuls are bf16 passes too, so the fused
    kernel matches what actually runs on device). Compare gradient
    direction and magnitude per tensor instead of elementwise."""
    model, params, x, d, cam = _setup(compute_dtype="bfloat16")
    ref, fused = _grads(model, params, x, d, cam)
    for (path, a), b in zip(ref, fused):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        assert nb == pytest.approx(na, rel=0.05), f"norm mismatch at {path}"
        if na > 1e-8:
            cos = float(a @ b / (na * nb))
            assert cos > 0.995, f"direction mismatch at {path}: cos={cos}"


def test_fused_gradients_appearance_embedding():
    model, params, x, d, cam = _setup(appearance_embed_dim=8)

    def f(fused):
        def loss(p):
            rgb, _ = _run(model, fused, p, x, d, cam)
            return jnp.sum(jnp.square(rgb))

        return loss

    g_ref = jax.grad(f(False))(params)
    g_f = jax.grad(f(True))(params)
    a = np.asarray(g_ref["appearance_embedding"])
    b = np.asarray(g_f["appearance_embedding"])
    scale = max(1e-3, float(np.max(np.abs(a))))
    np.testing.assert_allclose(b / scale, a / scale, atol=4e-2)


def test_fused_density_only_matches_full():
    """The coarse round's head-free kernel == the full stack's density,
    in outputs and in gradients (f32 for exactness)."""
    model, params, x, d, cam = _setup(compute_dtype="float32")

    def dens_only(p, xv):
        m = _Shell(model.config)
        return m._density_mlp(p, xv, d, cam, True)

    def dens_full(p, xv):
        cfg = dataclasses.replace(model.config, fused_mlps=False)
        m = _Shell(cfg)
        return m._field_mlps_remat(p, xv, d, cam, True)[1]

    a = dens_only(params, x)
    b = dens_full(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    ga = jax.grad(lambda p, xv: jnp.sum(jnp.tanh(dens_only(p, xv))),
                  argnums=(0, 1))(params, x)
    gb = jax.grad(lambda p, xv: jnp.sum(jnp.tanh(dens_full(p, xv))),
                  argnums=(0, 1))(params, x)
    flat_a = jax.tree_util.tree_leaves(ga)
    for a_leaf, (path, b_leaf) in zip(
        flat_a, jax.tree_util.tree_leaves_with_path(gb)
    ):
        scale = max(1e-3, float(jnp.max(jnp.abs(b_leaf))))
        np.testing.assert_allclose(
            np.asarray(a_leaf) / scale,
            np.asarray(b_leaf) / scale,
            atol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_fused_odd_ray_count():
    """Ray counts with no nice divisor fall back to rb=1 blocks."""
    model, params, x, d, cam = _setup(r=7, s=5)
    rgb_ref, dens_ref = _run(model, False, params, x, d, cam)
    rgb_f, dens_f = _run(model, True, params, x, d, cam)
    np.testing.assert_allclose(
        np.asarray(rgb_f), np.asarray(rgb_ref), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(dens_f), np.asarray(dens_ref), atol=2e-2, rtol=2e-2
    )
