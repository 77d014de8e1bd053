"""Field-gradient chain decomposition: gather -> blend -> interp -> scatter.

The decompose_step benchmark shows the field-grad path costs ~44 ms of
the 8192-ray step. This isolates its pieces on realistic march data:

  A. endpoint_features fwd                  (stream row-gather + blend fwd)
  B. grad(sum(endpoint_features)) wrt field (A + blend bwd + row-scatter)
  C. scatter alone                          (grad of gather, no blend)
  D. sample_features fwd given feats        (interp kernel fwd)
  E. grad through sample_features wrt feats (interp bwd kernel)

Usage: python -u benchmarks/microbench_field_grad.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tetranerf_tpu.geometry import build_mesh
    from tetranerf_tpu.ops.fused import (
        endpoint_features,
        march_features,
        ray_bounds,
        sample_features,
    )
    from tetranerf_tpu.utils import make_sphere_scene, sample_sphere_rays
    from tetranerf_tpu.utils.profiling import benchmark

    R, T, S = 8192, 240, 257
    points, _ = make_sphere_scene(100_000, seed=0)
    mesh = build_mesh(points, two_hop_table=False)
    # On device once: jitted closures over a numpy mesh would embed
    # the tables as HLO constants.
    mesh = jax.device_put(mesh)
    V = mesh.num_vertices
    field = jnp.asarray(
        np.random.default_rng(0).normal(size=(V, 64)), jnp.float32
    )

    rng = np.random.default_rng(1)
    sets = []
    march_fn = jax.jit(
        lambda o, d: march_features(mesh, None, o, d, T, compact_stages=0)
    )
    for _ in range(4):
        o, d = sample_sphere_rays(rng, R)
        res = march_fn(jnp.asarray(o), jnp.asarray(d))
        nears, fars, _, _, ray_mask = ray_bounds(res)
        dist = nears[:, None] + (fars - nears)[:, None] * jnp.linspace(
            0.01, 0.99, S
        )[None, :]
        sets.append((res, jnp.asarray(dist), ray_mask))
    jax.block_until_ready(sets)

    def report(name, fn, argsets):
        dt = benchmark(jax.jit(fn), argsets, warmup=1, repeats=3)
        print(f"{name:<52}{dt * 1e3:8.2f} ms")

    # A. endpoint features forward.
    report(
        "A endpoint_features fwd",
        lambda f, st: endpoint_features(f, st),
        [(field, r.stream) for r, _, _ in sets],
    )

    # B. full grad wrt field through endpoint_features.
    report(
        "B grad(endpoint_features) wrt field",
        lambda f, st: jax.grad(
            lambda q: jnp.sum(endpoint_features(q, st))
        )(f),
        [(field, r.stream) for r, _, _ in sets],
    )

    # C. scatter alone: grad of the raw stream row-gather.
    report(
        "C grad(row-gather) wrt field (scatter only)",
        lambda f, vids: jax.grad(
            lambda q: jnp.sum(q[jnp.maximum(vids, 0)] * 0.5)
        )(f),
        [(field, r.stream.vids) for r, _, _ in sets],
    )

    # D/E. interp kernel fwd / bwd given fixed feats.
    feats_sets = []
    for r, dist, ray_mask in sets:
        feats = jax.jit(endpoint_features)(field, r.stream)
        feats_sets.append((feats, r, dist, ray_mask))
    jax.block_until_ready(feats_sets)

    def sf(feats, r, dist, ray_mask):
        res2 = r._replace(feats=feats)
        out, _ = sample_features(res2, dist, ray_mask)
        return out

    report(
        "D sample_features fwd (interp kernel)",
        sf,
        feats_sets,
    )
    report(
        "E grad(sample_features) wrt feats (interp bwd)",
        lambda feats, r, dist, m: jax.grad(
            lambda q: jnp.sum(sf(q, r, dist, m))
        )(feats),
        feats_sets,
    )


if __name__ == "__main__" and "--modes" not in sys.argv:
    main()


def modes():
    """Compare sample_features modes at bench shapes (fwd and bwd)."""
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tetranerf_tpu.geometry import build_mesh
    from tetranerf_tpu.ops.fused import (
        endpoint_features,
        march_features,
        ray_bounds,
        sample_features,
    )
    from tetranerf_tpu.utils import make_sphere_scene, sample_sphere_rays
    from tetranerf_tpu.utils.profiling import benchmark

    R, T, S = 8192, 240, 257
    points, _ = make_sphere_scene(100_000, seed=0)
    mesh = build_mesh(points, two_hop_table=False)
    # On device once: jitted closures over a numpy mesh would embed
    # the tables as HLO constants.
    mesh = jax.device_put(mesh)
    V = mesh.num_vertices
    field = jnp.asarray(
        np.random.default_rng(0).normal(size=(V, 64)), jnp.float32
    )
    rng = np.random.default_rng(1)
    march_fn = jax.jit(
        lambda o, d: march_features(mesh, None, o, d, T, compact_stages=0)
    )
    feats_sets = []
    for _ in range(4):
        o, d = sample_sphere_rays(rng, R)
        res = march_fn(jnp.asarray(o), jnp.asarray(d))
        nears, fars, _, _, ray_mask = ray_bounds(res)
        dist = nears[:, None] + (fars - nears)[:, None] * jnp.linspace(
            0.01, 0.99, S
        )[None, :]
        feats = jax.jit(endpoint_features)(field, res.stream)
        feats_sets.append((feats, res, jnp.asarray(dist), ray_mask))
    jax.block_until_ready(feats_sets)

    def report(name, fn):
        dt = benchmark(jax.jit(fn), feats_sets, warmup=1, repeats=3)
        print(f"{name:<52}{dt * 1e3:8.2f} ms")

    for mode in ("pallas", True, False):
        def sf(feats, r, dist, m, _mode=mode):
            out, _ = sample_features(
                r._replace(feats=feats), dist, m, use_matmul=_mode
            )
            return out

        report(f"fwd  use_matmul={mode!r}", sf)
        report(
            f"bwd  use_matmul={mode!r}",
            lambda feats, r, dist, m, _sf=sf: jax.grad(
                lambda q: jnp.sum(_sf(q, r, dist, m))
            )(feats),
        )


if __name__ == "__main__" and "--modes" in sys.argv:
    modes()
    sys.exit(0)
