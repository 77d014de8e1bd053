"""Fused march+features must agree with the modular reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tetranerf_tpu.geometry import build_mesh
from tetranerf_tpu.ops import (
    march,
    march_features,
    match_samples,
    ray_bounds,
    sample_features,
)
from tetranerf_tpu.ops.interpolation import interpolate_values


@pytest.fixture(scope="module")
def ball_mesh(ball_points):
    # two_hop_table for the hops=2 parity tests (default is off).
    return build_mesh(ball_points, two_hop_table=True)


def _rays(rng, n):
    o = rng.normal(size=(n, 3))
    o *= 3.0 / np.linalg.norm(o, axis=1, keepdims=True)
    t = rng.uniform(-0.3, 0.3, size=(n, 3))
    d = t - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


@pytest.mark.parametrize("hops", [1, 2])
def test_fused_intervals_match_modular(ball_mesh, rng, hops):
    o, d = _rays(rng, 32)
    fused = march_features(ball_mesh, None, o, d, max_steps=128, hops=hops)
    modular = march(ball_mesh, o, d, max_steps=128)
    np.testing.assert_array_equal(
        np.asarray(fused.num_valid), np.asarray(modular.num_cells)
    )
    num = np.asarray(fused.num_valid)
    for r in range(len(o)):
        n = num[r]
        np.testing.assert_allclose(
            np.asarray(fused.t1[r, :n]), np.asarray(modular.t1[r, :n]), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(fused.cells[r, :n]), np.asarray(modular.cells[r, :n])
        )


def test_two_hop_features_match_one_hop(ball_mesh, rng):
    """The two-hop march is the SAME per-hop body run twice per fetched
    row (second block selected by the first hop's exit face), so every
    output — intervals, stream, endpoint features — is bit-identical to
    hops=1, with or without compaction."""
    o, d = _rays(rng, 16)
    field = jnp.asarray(
        rng.normal(size=(ball_mesh.num_vertices, 8)).astype(np.float32)
    )
    f1 = march_features(ball_mesh, field, o, d, max_steps=128, hops=1)
    f2 = march_features(ball_mesh, field, o, d, max_steps=128, hops=2)
    for name in ("num_valid", "cells", "t1", "hit", "overflow", "t0s"):
        np.testing.assert_array_equal(
            np.asarray(getattr(f1, name)), np.asarray(getattr(f2, name)),
            err_msg=name,
        )
    np.testing.assert_array_equal(
        np.asarray(f1.stream.vids), np.asarray(f2.stream.vids)
    )
    np.testing.assert_array_equal(
        np.asarray(f1.feats), np.asarray(f2.feats)
    )
    # Compaction composes with two-hop (bit-identical for any schedule).
    f3 = march_features(
        ball_mesh, field, o, d, max_steps=128, hops=2, compact_stages=2
    )
    np.testing.assert_array_equal(
        np.asarray(f1.cells), np.asarray(f3.cells)
    )
    np.testing.assert_array_equal(
        np.asarray(f1.feats), np.asarray(f3.feats)
    )


def test_fused_features_match_interpolation(ball_mesh):
    """Endpoint-lerped features == gather-per-sample interpolation.

    Uses a LOCAL rng: the error budget below is dominated by sliver-cell
    f32 amplification, which varies with the ray draw — a shared
    session rng made this test's outcome depend on suite order.
    """
    rng = np.random.default_rng(1234)
    o, d = _rays(rng, 16)
    field = jnp.asarray(
        rng.normal(size=(ball_mesh.num_vertices, 16)).astype(np.float32)
    )
    fused = march_features(ball_mesh, field, o, d, max_steps=128)
    nears, fars, _, _, ray_mask = ray_bounds(fused)
    assert np.asarray(ray_mask).all()
    s = np.linspace(0.05, 0.95, 48)[None, :].astype(np.float32)
    distances = jnp.asarray(
        np.asarray(nears)[:, None] * (1 - s) + np.asarray(fars)[:, None] * s
    )
    for use_matmul in [False, True]:
        feats, mask = sample_features(
            fused,
            distances,
            ray_mask,
            use_matmul=use_matmul,
            compute_dtype=jnp.float32,
        )
        modular = march(ball_mesh, o, d, max_steps=128)
        matched = match_samples(ball_mesh, modular, distances, o, d)
        ref = interpolate_values(
            matched["vertex_indices"], matched["barycentric"], field.T
        )
        m = np.asarray(mask) & np.asarray(matched["mask"])
        assert m.mean() > 0.98
        err = np.abs(np.asarray(feats) - np.asarray(ref))[m]
        # Sliver cells amplify f32 roundoff ~1/h in both formulations (they
        # just land it differently); typical agreement is ~3e-4.
        assert err.max() < 3e-2, f"use_matmul={use_matmul}"
        assert err.mean() < 1e-3, f"use_matmul={use_matmul}"
        # Masks agree
        np.testing.assert_array_equal(np.asarray(mask), np.asarray(matched["mask"]))


def test_fused_matmul_equals_lerp(ball_mesh, rng):
    o, d = _rays(rng, 8)
    field = jnp.asarray(
        rng.normal(size=(ball_mesh.num_vertices, 8)).astype(np.float32)
    )
    fused = march_features(ball_mesh, field, o, d, max_steps=64)
    nears, fars, _, _, ray_mask = ray_bounds(fused)
    s = np.linspace(0.1, 0.9, 16)[None, :].astype(np.float32)
    distances = jnp.asarray(
        np.asarray(nears)[:, None] * (1 - s) + np.asarray(fars)[:, None] * s
    )
    a, _ = sample_features(
        fused, distances, ray_mask, use_matmul=True, compute_dtype=jnp.float32
    )
    b, _ = sample_features(fused, distances, ray_mask, use_matmul=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_feats_differentiable(ball_mesh, rng):
    """Gradients flow to the field through the fused path (the reference's
    interpolate_values_backward scatter, ``tetranerf_tracer.cu:224-248``,
    is produced automatically by differentiating the gathers)."""
    o, d = _rays(rng, 4)
    field = jnp.asarray(
        rng.normal(size=(ball_mesh.num_vertices, 4)).astype(np.float32)
    )

    def loss(f):
        fused = march_features(ball_mesh, f, o, d, max_steps=64)
        nears, fars, _, _, ray_mask = ray_bounds(fused)
        dist = (nears[:, None] + fars[:, None]) / 2.0
        feats, mask = sample_features(fused, dist, ray_mask)
        return jnp.sum(feats**2)

    g = jax.grad(loss)(field)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_grad_stream_budget_matches_dense(ball_mesh, rng):
    """The compacted backward scatter (``grad_stream_budget``) is exact:
    with a sufficient budget the field gradient equals the dense
    scatter's bit for bit (dropped rows are all zero-bary padding)."""
    o, d = _rays(rng, 16)
    field = jnp.asarray(
        rng.normal(size=(ball_mesh.num_vertices, 4)).astype(np.float32)
    )

    def loss(f, budget):
        fused = march_features(
            ball_mesh, f, o, d, max_steps=64, grad_stream_budget=budget
        )
        nears, fars, _, _, ray_mask = ray_bounds(fused)
        dist = jnp.linspace(0.1, 0.9, 8)[None, :] * (fars - nears)[
            :, None
        ] + nears[:, None]
        feats, mask = sample_features(fused, dist, ray_mask)
        return jnp.sum(feats**2)

    g_dense = jax.grad(loss)(field, None)
    g_comp = jax.grad(loss)(field, 16 * 68)  # full budget: T+4 per ray
    np.testing.assert_array_equal(np.asarray(g_dense), np.asarray(g_comp))
    # Tight budget = exactly the batch's valid rows: still exact.
    nv = np.asarray(
        march_features(ball_mesh, None, o, d, max_steps=64).num_valid
    )
    needed = int(np.minimum(nv + 4, 68).sum())
    assert needed < 16 * 68  # compaction is actually compacting
    g_tight = jax.grad(loss)(field, needed)
    np.testing.assert_array_equal(np.asarray(g_dense), np.asarray(g_tight))
    # Starved budget: early rays keep their gradient, later rays drop
    # theirs — never NaN, never corruption of kept rows.
    g_tiny = jax.grad(loss)(field, 16 * 4)
    assert np.isfinite(np.asarray(g_tiny)).all()
    assert np.abs(np.asarray(g_tiny)).sum() > 0


def test_bf16_stream_close_to_f32(ball_mesh, rng):
    """``stream_dtype='bfloat16'`` rounds the stream rows once in each
    direction but must stay close to the f32 path — and the field
    gradient must accumulate in f32 (finite, dtype f32, small relative
    error vs dense f32; a bf16-accumulated scatter would diverge)."""
    o, d = _rays(rng, 16)
    field = jnp.asarray(
        rng.normal(size=(ball_mesh.num_vertices, 4)).astype(np.float32)
    )

    def loss(f, stream_dtype):
        fused = march_features(
            ball_mesh, f, o, d, max_steps=64, stream_dtype=stream_dtype
        )
        nears, fars, _, _, ray_mask = ray_bounds(fused)
        dist = jnp.linspace(0.1, 0.9, 8)[None, :] * (fars - nears)[
            :, None
        ] + nears[:, None]
        feats, mask = sample_features(fused, dist, ray_mask)
        return jnp.sum(feats**2), feats

    (l32, f32v), g32 = jax.value_and_grad(loss, has_aux=True)(field, None)
    (l16, f16v), g16 = jax.value_and_grad(loss, has_aux=True)(
        field, "bfloat16"
    )
    assert g16.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(f16v), np.asarray(f32v), atol=3e-2, rtol=3e-2
    )
    ref = np.abs(np.asarray(g32)).max()
    np.testing.assert_allclose(
        np.asarray(g16), np.asarray(g32), atol=3e-2 * max(ref, 1.0)
    )
    assert np.isfinite(np.asarray(g16)).all()


def test_biased_warp_range_matches_compacted(ball_mesh, rng):
    """The range-based warp over uncompacted intervals (with a dropped
    behind-origin prefix) must equal the reference-style warp over the
    compacted interval list."""
    from tetranerf_tpu.ops import biased_warp_range, ray_bounds
    from tetranerf_tpu.ops.sampling import biased_warp

    # Origins inside the mesh -> nonzero dropped prefix.
    o = np.zeros((8, 3), np.float32)
    d = rng.normal(size=(8, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = d.astype(np.float32)
    fused = march_features(ball_mesh, None, o, d, max_steps=96)
    nears, fars, first, num_kept, mask = ray_bounds(fused)
    assert np.asarray(mask).all()
    assert (np.asarray(first) > 0).any()  # prefix actually dropped
    bins = np.asarray(nears)[:, None] + np.linspace(0, 1, 17)[None, :] * (
        np.asarray(fars) - np.asarray(nears)
    )[:, None]
    got = np.asarray(
        biased_warp_range(fused, first, num_kept, nears, fars, jnp.asarray(bins))
    )
    # Reference path: compacted intervals via the modular march.
    modular = march(ball_mesh, o, d, max_steps=96)
    bounds = jnp.stack([modular.t0, modular.t1], axis=-1)
    bounds = jnp.where(jnp.isfinite(bounds), bounds, 0.0)
    expect = np.asarray(
        biased_warp(modular.num_cells, bounds, jnp.asarray(bins))
    )
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_occupancy_early_termination(ball_mesh):
    """With a huge density estimate in the packed rows, rays accumulate
    optical depth past -log(1e-3) within a few cells and terminate
    instead of marching the whole chord; density=0 (initial state) is
    exact."""
    rng = np.random.default_rng(0)
    o, d = _rays(rng, 32)
    base = march_features(ball_mesh, None, o, d, max_steps=128)
    occupied = ball_mesh.with_occupancy(
        np.full(ball_mesh.num_cells, 1e4, np.float32)
    )
    # occupancy present but termination off -> identical result
    off = march_features(occupied, None, o, d, max_steps=128)
    np.testing.assert_array_equal(
        np.asarray(base.cells), np.asarray(off.cells)
    )
    term = march_features(
        occupied, None, o, d, max_steps=128, use_occupancy=True
    )
    hit = np.asarray(term.hit)
    assert hit.any()
    nv_term = np.asarray(term.num_valid)[hit]
    nv_base = np.asarray(base.num_valid)[np.asarray(base.hit)]
    assert nv_term.max() <= 4  # a couple of grazing slivers at most
    assert nv_base.max() > 8  # the full march goes much deeper
    assert not np.asarray(term.overflow).any()  # termination != overflow
    # Zero occupancy terminates nothing even with the flag on.
    zero = march_features(
        ball_mesh, None, o, d, max_steps=128, use_occupancy=True
    )
    np.testing.assert_array_equal(
        np.asarray(base.cells), np.asarray(zero.cells)
    )


@pytest.mark.parametrize("ratio,stages", [(0.5, 2), (0.7, 4)])
def test_compaction_bit_identical(ball_mesh, ratio, stages):
    """Per-ray compaction must reproduce the uncompacted march exactly:
    same intervals, stream, features, hit/overflow flags — for ANY
    stage schedule (halving and finer ratios alike)."""
    rng = np.random.default_rng(3)
    o, d = _rays(rng, 256)
    # Mix in rays that miss the hull so done-at-start rows get compacted.
    o2, d2 = _rays(rng, 64)
    d2 = -d2  # point away from the ball -> miss
    o = np.concatenate([o, o2])
    d = np.concatenate([d, d2])
    field = jnp.asarray(
        rng.normal(size=(ball_mesh.num_vertices, 8)).astype(np.float32)
    )
    base = march_features(ball_mesh, field, o, d, max_steps=64)
    comp = march_features(
        ball_mesh, field, o, d, max_steps=64, compact_stages=stages,
        compact_ratio=ratio,
    )
    np.testing.assert_array_equal(np.asarray(base.cells), np.asarray(comp.cells))
    np.testing.assert_array_equal(np.asarray(base.t1), np.asarray(comp.t1))
    np.testing.assert_array_equal(np.asarray(base.hit), np.asarray(comp.hit))
    np.testing.assert_array_equal(
        np.asarray(base.overflow), np.asarray(comp.overflow)
    )
    np.testing.assert_array_equal(
        np.asarray(base.stream.vids), np.asarray(comp.stream.vids)
    )
    np.testing.assert_array_equal(
        np.asarray(base.stream.pos), np.asarray(comp.stream.pos)
    )
    np.testing.assert_array_equal(
        np.asarray(base.stream.bary), np.asarray(comp.stream.bary)
    )
    np.testing.assert_array_equal(np.asarray(base.feats), np.asarray(comp.feats))


def test_compaction_budget_exhaustion_overflow(ball_mesh):
    """Rays still active when the step budget runs out mid-cascade must
    keep done=False and surface as overflow, exactly like the
    uncompacted march."""
    rng = np.random.default_rng(4)
    o, d = _rays(rng, 256)
    base = march_features(ball_mesh, None, o, d, max_steps=16)
    comp = march_features(
        ball_mesh, None, o, d, max_steps=16, compact_stages=2
    )
    assert np.asarray(base.overflow).any()  # bound is adversarially tight
    np.testing.assert_array_equal(
        np.asarray(base.overflow), np.asarray(comp.overflow)
    )
    np.testing.assert_array_equal(np.asarray(base.cells), np.asarray(comp.cells))


def test_compaction_with_occupancy(ball_mesh):
    """Compaction composes with occupancy termination (the combination
    that converts early exits into wall-clock)."""
    rng = np.random.default_rng(5)
    o, d = _rays(rng, 256)
    occupied = ball_mesh.with_occupancy(
        np.full(ball_mesh.num_cells, 1e4, np.float32)
    )
    base = march_features(
        occupied, None, o, d, max_steps=64, use_occupancy=True
    )
    comp = march_features(
        occupied, None, o, d, max_steps=64, use_occupancy=True,
        compact_stages=2,
    )
    np.testing.assert_array_equal(np.asarray(base.cells), np.asarray(comp.cells))
    np.testing.assert_array_equal(np.asarray(base.t1), np.asarray(comp.t1))
