"""Fuzz/robustness: random meshes x adversarial rays must never produce
NaNs or out-of-range outputs (the marcher replaces OptiX's watertight
traversal, so degenerate geometry is the main risk — SURVEY §7.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tetranerf_tpu.geometry import build_mesh
from tetranerf_tpu.models import RayBundle, TetraNerf, TetrahedraNerfConfig


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_model_never_nan(seed):
    rng = np.random.default_rng(seed)
    kind = seed % 3
    if kind == 0:  # uniform ball
        pts = rng.normal(size=(300, 3)) * 0.5
    elif kind == 1:  # thin shell (slivers)
        d = rng.normal(size=(300, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        pts = d * (1.0 + rng.normal(scale=0.01, size=(300, 1)))
    else:  # clustered (wild cell-size variation)
        centers = rng.normal(size=(5, 3))
        pts = (
            centers[rng.integers(0, 5, 300)]
            + rng.normal(scale=0.05, size=(300, 3))
        )
    mesh = build_mesh(pts)
    cfg = TetrahedraNerfConfig(
        num_samples=16,
        num_fine_samples=8,
        max_intersected_triangles=64,
        field_dim=8,
        hidden_size=16,
        use_biased_sampler=True,
        use_gradient_scaling=True,
        compute_dtype="float32",
    )
    model = TetraNerf(cfg, mesh)
    params = model.init_params(jax.random.PRNGKey(seed))

    # Adversarial ray set: axis-aligned, grazing, inside-out, on-vertex,
    # zero-ish length chords, plus random.
    o = np.concatenate(
        [
            np.array(
                [
                    [-5, 0, 0],  # axis aligned
                    [0, 0, 5],  # axis aligned
                    [0, 0, 0],  # origin inside
                    pts[0] + 1e-7,  # through a vertex
                    [5, 5, 5],  # diagonal
                    [-5, 2.0, 0],  # grazing
                ],
                np.float64,
            ),
            rng.normal(size=(26, 3)) * 3,
        ]
    ).astype(np.float32)
    d = np.concatenate(
        [
            np.array(
                [
                    [1, 0, 0],
                    [0, 0, -1],
                    [0, 1, 0],
                    [0, 0, 1],
                    [-1, -1, -1],
                    [1, -0.38, 0],
                ],
                np.float64,
            ),
            rng.normal(size=(26, 3)),
        ]
    )
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = d.astype(np.float32)

    def loss(p, key):
        out = model.get_outputs(
            p, RayBundle(jnp.asarray(o), jnp.asarray(d)), rng=key, train=True
        )
        return jnp.sum(out["rgb"]) + jnp.sum(out["depth"]) + jnp.sum(
            out["accumulation"]
        ), out

    (val, out), grads = jax.value_and_grad(loss, has_aux=True)(
        params, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(val))
    rgb = np.asarray(out["rgb"])
    assert np.isfinite(rgb).all()
    assert (rgb >= 0).all() and (rgb <= 1 + 1e-5).all()
    acc = np.asarray(out["accumulation"])
    assert (acc >= 0).all() and (acc <= 1 + 1e-4).all()
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
