"""Pallas gather kernel (interpret mode on CPU; exact on-device test runs
on TPU — see ops/pallas_gather.py docstring for the measured verdict)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tetranerf_tpu.ops.pallas_gather import pallas_gather_rows


def test_pallas_gather_interpret(rng):
    tab = jnp.asarray(rng.normal(size=(500, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 500, size=64).astype(np.int32))
    out = pallas_gather_rows(idx, tab, block_rows=32, num_buffers=4,
                             interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(tab)[np.asarray(idx)], atol=0
    )


def test_pallas_gather_validation(rng):
    tab = jnp.zeros((10, 100), jnp.float32)  # not 128-aligned
    idx = jnp.zeros((32,), jnp.int32)
    with pytest.raises(ValueError):
        pallas_gather_rows(idx, tab, block_rows=32, interpret=True)
    tab = jnp.zeros((10, 128), jnp.float32)
    idx = jnp.zeros((33,), jnp.int32)  # not a multiple of block
    with pytest.raises(ValueError):
        pallas_gather_rows(idx, tab, block_rows=32, interpret=True)
