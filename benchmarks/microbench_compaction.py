"""Does per-ray compaction cash early termination into wall-clock?

Times ``march_features`` (geometry only) on the bench scene across
``compact_stages`` x {cold occupancy, warm occupancy}, plus a synthetic
"warm" occupancy that marks every surface cell opaque (the steady-state
upper bound without training). Isolates the march from the rest of the
step so the compaction lever can be measured directly.

Usage: python benchmarks/microbench_compaction.py [--rays 8192]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--points", type=int, default=100_000)
    p.add_argument("--rays", type=int, default=8192)
    p.add_argument("--max-steps", type=int, default=240)
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    from tetranerf_tpu.geometry import build_mesh
    from tetranerf_tpu.ops.fused import march_features
    from tetranerf_tpu.utils import make_sphere_scene, sample_sphere_rays
    from tetranerf_tpu.utils.profiling import benchmark

    points, _ = make_sphere_scene(args.points, seed=0)
    full = build_mesh(points, two_hop_table=False)
    mesh = full.slim().on_device()

    rng = np.random.default_rng(0)
    o, d = sample_sphere_rays(rng, args.rays)
    o = jnp.asarray(o)
    d = jnp.asarray(d)

    # Synthetic warm occupancy: cells whose centroid is within the shell
    # band are opaque (the sphere surface), everything else empty. This
    # is what a converged occupancy EMA looks like on this scene.
    verts = np.asarray(full.vertices)
    cells = np.asarray(full.cells)
    cent = verts[cells].mean(axis=1)
    r = np.linalg.norm(cent, axis=1)
    occ = np.where(np.abs(r - 1.0) < 0.05, 0.9, 0.0).astype(np.float32)
    table_warm = jnp.asarray(mesh.march_table).at[:, 24].set(occ)
    mesh_warm = dataclasses.replace(
        mesh, march_table=jax.device_put(table_warm)
    )

    for use_occ, m, label in (
        (False, mesh, "no-occ"),
        (True, mesh, "occ-cold"),
        (True, mesh_warm, "occ-warm"),
    ):
        for stages in (0, 1, 2, 3, 4):
            fn = jax.jit(
                lambda mm, oo, dd, s=stages, u=use_occ: march_features(
                    mm, None, oo, dd, args.max_steps,
                    use_occupancy=u, compact_stages=s,
                ).num_valid
            )
            # Several distinct batches so dispatches aren't memoized.
            batches = []
            for i in range(4):
                bo, bd = sample_sphere_rays(rng, args.rays)
                batches.append((m, jnp.asarray(bo), jnp.asarray(bd)))
            ms = benchmark(fn, batches) * 1e3
            nv = np.asarray(fn(m, o, d))
            print(
                f"{label:9s} stages={stages}  {ms:7.2f} ms   "
                f"crossings p50={np.percentile(nv, 50):.0f} "
                f"max={nv.max()}"
            )


if __name__ == "__main__":
    main()
