"""Pallas endpoint-interpolation kernel vs the XLA reference formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetranerf_tpu.ops.pallas_interp import interp_endpoints


def _reference(feats, k, frac):
    f0 = jnp.take_along_axis(feats, k[..., None], axis=1)
    f1 = jnp.take_along_axis(feats, (k + 1)[..., None], axis=1)
    return (1.0 - frac)[..., None] * f0 + frac[..., None] * f1


@pytest.mark.parametrize("rays,samples,endpoints,feat", [
    (8, 33, 17, 64),
    (4, 129, 41, 64),
    (2, 16, 9, 32),
])
def test_forward_matches_reference(rays, samples, endpoints, feat):
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((rays, endpoints, feat)), jnp.float32)
    k = jnp.asarray(rng.integers(0, endpoints - 1, (rays, samples)), jnp.int32)
    frac = jnp.asarray(rng.uniform(0, 1, (rays, samples)), jnp.float32)
    out = interp_endpoints(feats, k, frac)
    ref = _reference(feats, k, frac)
    # Kernel matmul runs in bfloat16 (the model's compute dtype).
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_backward_matches_reference():
    rng = np.random.default_rng(1)
    rays, samples, endpoints, feat = 4, 37, 21, 64
    feats = jnp.asarray(rng.standard_normal((rays, endpoints, feat)), jnp.float32)
    k = jnp.asarray(rng.integers(0, endpoints - 1, (rays, samples)), jnp.int32)
    frac = jnp.asarray(rng.uniform(0, 1, (rays, samples)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((rays, samples, feat)), jnp.float32)

    def loss_kernel(f):
        return jnp.sum(interp_endpoints(f, k, frac) * cot)

    def loss_ref(f):
        return jnp.sum(_reference(f, k, frac) * cot)

    g_kernel = jax.grad(loss_kernel)(feats)
    g_ref = jax.grad(loss_ref)(feats)
    np.testing.assert_allclose(
        np.asarray(g_kernel), np.asarray(g_ref), atol=5e-2, rtol=1e-2
    )


def test_gradient_only_flows_to_feats():
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((2, 9, 32)), jnp.float32)
    k = jnp.zeros((2, 5), jnp.int32)
    frac = jnp.asarray(rng.uniform(0, 1, (2, 5)), jnp.float32)
    # frac/k take no gradient by design (no parameter path in the model).
    g = jax.grad(lambda fr: jnp.sum(interp_endpoints(feats, k, fr)))(frac)
    np.testing.assert_array_equal(np.asarray(g), 0.0)
