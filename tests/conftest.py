"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is
exercised on virtual CPU devices instead (same XLA collectives/partitioner
code path as on a real mesh).

NOTE: this environment preloads jax (with a TPU plugin) from
``sitecustomize`` at interpreter start, so ``JAX_PLATFORMS`` env tweaks
are too late — the platform must be forced through ``jax.config``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite is compile-dominated on this
# single-core host; cached XLA programs cut repeat runs from ~25 min to
# minutes.
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def ball_points():
    """A generic-position point cloud: 400 points in a unit ball.

    Uses a PRIVATE generator: the session ``rng`` is mutable and shared,
    so drawing from it here would make the mesh (and every
    sliver-sensitive tolerance downstream) depend on which tests ran
    first."""
    pts = np.random.default_rng(7).normal(size=(2000, 3))
    pts = pts[np.linalg.norm(pts, axis=1) < 2.5][:400]
    return pts * 0.4


@pytest.fixture(scope="session")
def shell_points(rng):
    """Surface-like cloud: points on a sphere shell plus interior jitter."""
    d = rng.normal(size=(1500, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r = 1.0 + rng.normal(scale=0.02, size=(1500, 1))
    inner = rng.uniform(-0.6, 0.6, size=(200, 3))
    return np.concatenate([d * r, inner], axis=0)


@pytest.fixture(scope="session")
def cube_mesh():
    """Hand-built 9-vertex / 12-tet cube (same construction idea as the
    reference's ``test_trace_rays_simple`` fixture,
    ``tests/test_tetrahedra_tracer.py:231-253``): unit cube corners plus the
    center, 12 tetrahedra fanning from the center over the 12 boundary
    triangles (2 per cube face)."""
    corners = np.array(
        [
            [0, 0, 0],
            [1, 0, 0],
            [0, 1, 0],
            [1, 1, 0],
            [0, 0, 1],
            [1, 0, 1],
            [0, 1, 1],
            [1, 1, 1],
        ],
        dtype=np.float64,
    )
    center = np.array([[0.5, 0.5, 0.5]])
    vertices = np.concatenate([corners, center], axis=0)
    # Two triangles per face; each face quad given by 4 corner ids.
    quads = [
        (0, 1, 3, 2),  # z = 0
        (4, 5, 7, 6),  # z = 1
        (0, 1, 5, 4),  # y = 0
        (2, 3, 7, 6),  # y = 1
        (0, 2, 6, 4),  # x = 0
        (1, 3, 7, 5),  # x = 1
    ]
    cells = []
    for a, b, c, d in quads:
        cells.append([a, b, c, 8])
        cells.append([a, c, d, 8])
    return vertices, np.asarray(cells, dtype=np.int32)
