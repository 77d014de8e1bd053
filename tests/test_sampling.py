"""Sampler math: stratified bins, biased warp, PDF resampling, merge."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tetranerf_tpu.ops.sampling import (
    _merge_sorted_rows,
    biased_warp,
    pdf_sample,
    stratified_bins,
    uniform_sample,
)


def test_stratified_bins_bounds():
    bins = np.asarray(stratified_bins(jax.random.PRNGKey(0), 16, 32))
    assert bins.shape == (16, 33)
    assert (np.diff(bins, axis=1) >= 0).all()
    assert (bins >= 0).all() and (bins <= 1).all()
    # Deterministic (eval) mode = exact linspace.
    det = np.asarray(stratified_bins(None, 4, 8))
    np.testing.assert_allclose(det[0], np.linspace(0, 1, 9), atol=1e-7)


def test_uniform_sample():
    nears = jnp.asarray([1.0, 2.0])
    fars = jnp.asarray([3.0, 4.0])
    bins = np.asarray(uniform_sample(None, nears, fars, 4))
    np.testing.assert_allclose(bins[0], np.linspace(1, 3, 5), atol=1e-6)
    np.testing.assert_allclose(bins[1], np.linspace(2, 4, 5), atol=1e-6)


def test_biased_warp_equal_mass_per_interval():
    """The warp assigns each interval an equal share of samples
    (reference ``map_from_real_distances_to_biased_with_bounds``,
    model.py:111-122)."""
    # Two intervals: [0, 1] and [1, 1.5] (different lengths).
    bounds = jnp.asarray([[[0.0, 1.0], [1.0, 1.5]]])
    num = jnp.asarray([2], jnp.int32)
    samples = jnp.asarray([np.linspace(0.0, 1.5, 9)])
    mapped = np.asarray(biased_warp(num, bounds, samples))
    # First half of the unit range maps into [0,1], second into [1,1.5].
    assert mapped[0, 0] == pytest.approx(0.0, abs=1e-6)
    assert mapped[0, 4] == pytest.approx(1.0, abs=1e-5)  # u=0.5 boundary
    assert mapped[0, -1] == pytest.approx(1.5, abs=1e-5)
    assert (np.diff(mapped[0]) >= -1e-6).all()


def test_merge_sorted_rows(rng):
    a = np.sort(rng.normal(size=(8, 13)), axis=1).astype(np.float32)
    b = np.sort(rng.normal(size=(8, 7)), axis=1).astype(np.float32)
    merged = np.asarray(_merge_sorted_rows(jnp.asarray(a), jnp.asarray(b)))
    expect = np.sort(np.concatenate([a, b], axis=1), axis=1)
    np.testing.assert_allclose(merged, expect, atol=0)


def test_merge_sorted_rows_with_ties():
    a = jnp.asarray([[0.0, 1.0, 1.0, 2.0]])
    b = jnp.asarray([[1.0, 1.0, 3.0]])
    merged = np.asarray(_merge_sorted_rows(a, b))
    np.testing.assert_allclose(merged[0], [0, 1, 1, 1, 1, 2, 3])


def test_pdf_sample_concentrates_on_weight():
    bins = jnp.broadcast_to(jnp.linspace(0, 1, 9)[None], (4, 9))
    weights = jnp.zeros((4, 8)).at[:, 3].set(100.0)  # mass in bin [3/8, 4/8]
    out = np.asarray(
        pdf_sample(None, bins, weights, 16, include_original=False)
    )
    assert out.shape == (4, 17)
    assert (np.diff(out, axis=1) >= -1e-6).all()
    inside = (out >= 3 / 8 - 1e-3) & (out <= 4 / 8 + 1e-3)
    assert inside.mean() > 0.8


def test_pdf_sample_include_original_sorted():
    key = jax.random.PRNGKey(1)
    bins = jnp.broadcast_to(jnp.linspace(0, 1, 17)[None], (3, 17))
    weights = jax.random.uniform(key, (3, 16))
    out = np.asarray(pdf_sample(key, bins, weights, 16, include_original=True))
    assert out.shape == (3, 17 + 17)
    assert (np.diff(out, axis=1) >= -1e-6).all()
    # All original bin edges are present in the merged output.
    for r in range(3):
        for v in np.asarray(bins[r]):
            assert np.any(np.abs(out[r] - v) < 1e-6)
