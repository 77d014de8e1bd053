"""Pallas scatter-add kernel vs XLA's scatter (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from tetranerf_tpu.ops.pallas_scatter import gather_rows, scatter_add_rows


def test_scatter_matches_xla():
    rng = np.random.default_rng(0)
    n, v, f = 5000, 300, 64
    idx = jnp.asarray(rng.integers(0, v, n, dtype=np.int32))
    vals = jnp.asarray(rng.standard_normal((n, f)), jnp.float32)
    out = scatter_add_rows(
        idx, vals, v, window_rows=128, chunk=500, interpret=True
    )
    ref = jnp.zeros((v, f), jnp.float32).at[idx].add(vals)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_scatter_drops_negative_indices():
    vals = jnp.ones((4, 8), jnp.float32)
    idx = jnp.asarray([0, -1, 2, 2], jnp.int32)
    out = scatter_add_rows(idx, vals, 3, window_rows=8, chunk=4, interpret=True)
    expected = np.zeros((3, 8), np.float32)
    expected[0] = 1.0
    expected[2] = 2.0
    np.testing.assert_allclose(np.asarray(out), expected)


def test_gather_rows_grad_is_pallas_scatter():
    rng = np.random.default_rng(1)
    v, f, n = 97, 32, 400
    table = jnp.asarray(rng.standard_normal((v, f)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, v, (10, n // 10), dtype=np.int32))
    cot = jnp.asarray(rng.standard_normal((10, n // 10, f)), jnp.float32)

    g = jax.grad(lambda t: jnp.sum(gather_rows(t, idx, True) * cot))(table)
    g_ref = jax.grad(lambda t: jnp.sum(t[idx] * cot))(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)
