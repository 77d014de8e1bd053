"""Barycentric coordinate computation (differentiable).

The reference computes barycentrics on the GPU and injects analytic
gradients w.r.t. tetrahedra vertices and query points through a custom
autograd function (``tetranerf/utils/extension/__init__.py:45-68``,
validated in ``tests/test_barycentrics.py``). In JAX the solve itself is
differentiable, so the analytic-gradient plumbing disappears;
``add_barycentrics_grad`` is kept as an API-parity identity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def barycentric_coordinates(vertices, points):
    """Barycentric weights of ``points`` w.r.t. tetrahedra ``vertices``.

    Args:
        vertices: ``[..., 4, 3]`` tetrahedron corners.
        points: ``[..., 3]`` query points.

    Returns ``[..., 3]`` weights of vertices 1..3 (weight of vertex 0 is
    ``1 - sum``), matching the reference's edge-matrix solve
    ``T = (v1-v0, v2-v0, v3-v0); w = T^{-1} (p - v0)``.
    """
    v0 = vertices[..., 0, :]
    t = jnp.swapaxes(vertices[..., 1:, :] - v0[..., None, :], -1, -2)
    rhs = (points - v0)[..., None]
    return jnp.linalg.solve(t, rhs)[..., 0]


def add_barycentrics_grad(barycentrics, vertices, points):
    """Identity on ``barycentrics`` that routes gradients to ``vertices``
    and ``points`` — API parity with the reference wrapper.

    In JAX, compute barycentrics with :func:`barycentric_coordinates` and
    gradients flow automatically; this recomputes them differentiably and
    substitutes the (numerically identical) value.
    """
    recomputed = barycentric_coordinates(vertices, points)
    # Value comes from the input; gradient flows through the recomputation.
    return recomputed + jax.lax.stop_gradient(barycentrics - recomputed)
