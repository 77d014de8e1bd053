"""interpolate_values parity tests.

Mirrors the reference's ``test_tetrahedra_interpolate_values``
(``tests/test_tetrahedra_tracer.py:346-456``): forward vs. an einsum
ground truth, backward vs. autograd, over the template dimensions the
CUDA kernel supports (interpolation_dim ∈ {2, 3, 4, 6};
``src/tetrahedra_tracer.cu:263-290``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tetranerf_tpu.ops import interpolate_values


@pytest.mark.parametrize("k", [2, 3, 4, 6])
def test_interpolate_values_forward(rng, k):
    num_vertices, field_dim, n = 50, 8, 40
    field = jnp.asarray(
        rng.normal(size=(field_dim, num_vertices)).astype(np.float32)
    )
    idx = rng.integers(0, num_vertices, size=(n, k)).astype(np.int32)
    bary = rng.normal(size=(n, k - 1)).astype(np.float32) * 0.3
    out = np.asarray(interpolate_values(jnp.asarray(idx), jnp.asarray(bary), field))
    assert out.shape == (n, field_dim)
    w = np.concatenate([1 - bary.sum(-1, keepdims=True), bary], axis=-1)
    expect = np.einsum("nk,nkf->nf", w, np.asarray(field).T[idx])
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_interpolate_values_invalid_indices(rng):
    field = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))
    idx = jnp.asarray(
        np.array([[0, 1, 0xFFFFFFFF, 2]], dtype=np.uint32)
    )
    bary = jnp.asarray(np.array([[0.2, 0.3, 0.1]], np.float32))
    out = np.asarray(interpolate_values(idx, bary, field))
    # uint_max index contributes zero (reference :203-220).
    ft = np.asarray(field).T
    expect = 0.4 * ft[0] + 0.2 * ft[1] + 0.0 + 0.1 * ft[2]
    np.testing.assert_allclose(out[0], expect, atol=1e-5)


def test_interpolate_values_backward(rng):
    """Field gradients match the hand-derived scatter (the reference
    validates its atomicAdd backward against torch autograd)."""
    num_vertices, field_dim, n = 30, 4, 16
    field = jnp.asarray(
        rng.normal(size=(field_dim, num_vertices)).astype(np.float32)
    )
    idx = jnp.asarray(rng.integers(0, num_vertices, size=(n, 4)).astype(np.int32))
    bary = jnp.asarray((rng.dirichlet(np.ones(4), size=n)[:, 1:]).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, field_dim)).astype(np.float32))

    def f(fld):
        return jnp.sum(interpolate_values(idx, bary, fld) * g)

    grad = np.asarray(jax.grad(f)(field))
    # Manual scatter: d/dfield[f, v] = sum over samples where idx==v of w*g.
    w = np.concatenate(
        [1 - np.asarray(bary).sum(-1, keepdims=True), np.asarray(bary)], -1
    )
    expect = np.zeros((field_dim, num_vertices), np.float32)
    for s in range(n):
        for kk in range(4):
            expect[:, np.asarray(idx)[s, kk]] += w[s, kk] * np.asarray(g)[s]
    np.testing.assert_allclose(grad, expect, atol=1e-4)


def test_interpolate_values_full_weights(rng):
    """Passing K weights (instead of K-1) uses them as-is."""
    field = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 10, size=(5, 4)).astype(np.int32))
    w4 = jnp.asarray(rng.dirichlet(np.ones(4), size=5).astype(np.float32))
    out = np.asarray(interpolate_values(idx, w4, field))
    expect = np.einsum("nk,nkf->nf", np.asarray(w4), np.asarray(field).T[np.asarray(idx)])
    np.testing.assert_allclose(out, expect, atol=1e-5)
    with pytest.raises(ValueError):
        interpolate_values(idx, w4[:, :2], field)
