"""Render-path timing at viewer resolution (800x800 = 640K rays).

Modes: full eval config, fast (coarse-only, reduced samples), and
cached-march re-render (static camera). Usage:
python -u benchmarks/bench_render.py [--side 800]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--points", type=int, default=100_000)
    p.add_argument("--side", type=int, default=800)
    p.add_argument("--chunk", type=int, default=16384)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    from tetranerf_tpu.geometry import build_mesh
    from tetranerf_tpu.models import TetraNerf
    from tetranerf_tpu.training import Trainer, tetranerf_preset
    from tetranerf_tpu.utils import make_sphere_scene

    points, colors = make_sphere_scene(args.points, seed=0)
    mesh = build_mesh(points, two_hop_table=False)
    # On device once: jitted closures over a numpy mesh would embed
    # the tables as HLO constants.
    mesh = jax.device_put(mesh)
    config = tetranerf_preset()
    config.model.max_intersected_triangles = 256
    model = TetraNerf(config.model, mesh)
    trainer = Trainer(config, model, point_colors=colors)

    # Pinhole camera on the sphere scene.
    side = args.side
    pos = np.array([0.0, 0.0, 2.5], np.float32)
    xs = (np.arange(side) + 0.5) / side - 0.5
    u, v = np.meshgrid(xs, xs)
    dirs = np.stack([u, v, -np.ones_like(u)], axis=-1).reshape(-1, 3)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = np.broadcast_to(pos, dirs.shape).copy()
    n = len(dirs)

    # Tune bounds once (uses the probe batch).
    trainer.tune_traversal_steps(
        {"origins": origins[:8192], "directions": dirs[:8192]}
    )
    print(f"# {side}x{side} = {n:,} rays, tuned bound "
          f"{trainer.tuned_max_steps}", flush=True)

    # Host fetch of a full frame through the dev tunnel is an environment
    # artifact (~MB/s; a real TPU host fetches over PCIe at GB/s), so
    # device render time and host transfer are reported separately:
    # device_render=True keeps results on device and forces completion
    # with a one-element fetch.
    def timed(name, fn, device_render=True):
        fn()  # warmup/compile
        best = np.inf
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(np.ravel(out["rgb"])[-1])  # force completion
            best = min(best, time.perf_counter() - t0)
        print(f"{name:40s} {best:7.2f} s  "
              f"({n / best / 1e3:7.0f}K rays/s)", flush=True)
        return best

    import jax.numpy as jnp

    def device_only(fn):
        """Run the chunked render but keep per-chunk results on device."""
        outs = fn()
        return outs

    # Monkeypatch-free device-side variants: call the underlying jitted
    # fns directly per chunk and keep device arrays.
    def run_device(num_samples=None, num_fine=None, cache=None,
                   adaptive=False):
        if cache is not None:
            bounds = cache.get("bounds")
            outs = []
            for ci, (c, o, d) in enumerate(cache["chunks"]):
                ns, nf = num_samples, num_fine
                t_c = bounds[ci] if bounds else None
                if adaptive and t_c is not None:
                    # The trainer owns the budget policy — the bench must
                    # measure exactly what the viewer ships.
                    ns, nf = trainer.adaptive_budget(bounds, ci, ns, nf)
                fn = trainer._cached_render_fn(ns, nf, t_c)
                outs.append(fn(trainer.state.params, c, o, d,
                               trainer.mesh_tables))
            return {"rgb": outs[-1]["rgb"]}
        fn = trainer._fast_eval_fn(num_samples, num_fine)
        outs = []
        for i in range(0, n, args.chunk):
            o = jnp.asarray(origins[i : i + args.chunk])
            d = jnp.asarray(dirs[i : i + args.chunk])
            outs.append(fn(trainer.state.params, o, d, trainer.mesh_tables, trainer._occ_cap_dev))
        return {"rgb": outs[-1]["rgb"]}

    timed("device: full render (128+128)",
          lambda: run_device(None, None))
    timed("device: fast render (64 coarse)",
          lambda: run_device(64, 0))
    t0 = time.perf_counter()
    cache = trainer.cache_camera(origins, dirs, chunk=args.chunk)
    print(f"# cache_camera: {time.perf_counter() - t0:.2f} s", flush=True)
    timed("device: cached re-render (128+128)",
          lambda: run_device(None, None, cache))
    timed("device: cached re-render (64 coarse)",
          lambda: run_device(64, 0, cache))

    t0 = time.perf_counter()
    scache = trainer.cache_camera(origins, dirs, chunk=args.chunk,
                                  sort_by_depth=True)
    print(f"# cache_camera(sort_by_depth): {time.perf_counter() - t0:.2f} s "
          f"bounds={scache['bounds']}", flush=True)
    timed("device: sorted cached re-render (128+128)",
          lambda: run_device(None, None, scache))
    timed("device: sorted+adaptive re-render",
          lambda: run_device(None, None, scache, adaptive=True))

    # Quality check: adaptive refine vs the dense full render.
    dense = trainer.render_cached(cache)
    adap = trainer.render_cached(scache, adaptive_samples=True)
    mse = float(np.mean((dense["rgb"] - adap["rgb"]) ** 2))
    print(f"# adaptive-vs-dense PSNR: {-10 * np.log10(max(mse, 1e-12)):.2f} dB",
          flush=True)

    # End-to-end including the host fetch (tunnel-bandwidth-bound here).
    timed("host e2e: cached fast render",
          lambda: trainer.render_cached(cache, 64, 0))


if __name__ == "__main__":
    main()
