"""Profile the real train step with the XLA device profiler and print a
per-HLO-op cost table (exact device self-times — no dispatch-latency
inflation, unlike wall-clock microbenches; see utils/profiling.py notes
on the ~35-40 ms host<->device round trip this host pays per sync).

Run: python -u benchmarks/trace_step.py [--warmup 300] [--skip-grid 0]
         [--top 40] [--no-occupancy]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--points", type=int, default=100_000)
    p.add_argument("--rays", type=int, default=8192)
    p.add_argument("--warmup", type=int, default=300)
    p.add_argument("--skip-grid", type=int, default=0)
    p.add_argument("--no-occupancy", action="store_true")
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--fused-mlps", action="store_true")
    p.add_argument("--interp", default=None, help="interp_mode override")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--trace-steps", type=int, default=3)
    p.add_argument("--out", default="/tmp/tnerf_trace")
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tetranerf_tpu.geometry import build_mesh
    from tetranerf_tpu.models import TetraNerf
    from tetranerf_tpu.training import Trainer, tetranerf_preset
    from tetranerf_tpu.utils import (
        make_sphere_scene,
        sample_sphere_rays,
        sphere_ray_targets,
    )

    points, colors = make_sphere_scene(args.points, seed=0)
    mesh = build_mesh(points, two_hop_table=False)
    print(f"# mesh: {mesh.num_vertices} verts, {mesh.num_cells} cells")

    config = tetranerf_preset()
    config.model.num_samples = 128
    config.model.num_fine_samples = 128
    config.model.max_intersected_triangles = 256
    if args.no_occupancy:
        config.model.use_occupancy_field = False
    config.model.skip_grid_resolution = args.skip_grid
    if args.no_remat:
        config.model.remat_mlps = False
    if args.fused_mlps:
        config.model.fused_mlps = True
    if args.interp:
        config.model.interp_mode = args.interp
    model = TetraNerf(config.model, mesh)
    trainer = Trainer(config, model, point_colors=colors)

    rng = np.random.default_rng(0)

    def make_batch():
        o, d = sample_sphere_rays(rng, args.rays)
        return {
            "origins": o,
            "directions": d,
            "rgb": sphere_ray_targets(o, d),
        }

    import time

    t0 = time.perf_counter()
    for i in range(args.warmup):
        m = trainer.train_step(make_batch())
        if (i + 1) % 100 == 0:
            print(
                f"# warm {i+1} loss={float(m['loss']):.4f} "
                f"bound={trainer.tuned_max_steps} "
                f"({time.perf_counter()-t0:.0f}s)",
                flush=True,
            )
    print(f"# tuned bound after warmup: {trainer.tuned_max_steps}")

    batches = [make_batch() for _ in range(4)]
    for b in batches:
        m = trainer.train_step(b)
    float(m["loss"])

    # Timed loop (one sync per 20 dispatches: latency amortized to ~2ms).
    t0 = time.perf_counter()
    for i in range(20):
        m = trainer.train_step(batches[i % 4])
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 20
    print(f"# steady step: {dt*1e3:.1f} ms ({args.rays/dt:,.0f} rays/s)")

    shutil.rmtree(args.out, ignore_errors=True)
    jax.profiler.start_trace(args.out)
    for i in range(args.trace_steps):
        m = trainer.train_step(batches[i % 4])
    float(m["loss"])
    jax.profiler.stop_trace()

    paths = glob.glob(f"{args.out}/**/*.xplane.pb", recursive=True)
    print(f"# xplane: {paths}")
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(paths, "hlo_stats", {})
    table = json.loads(data.decode() if isinstance(data, bytes) else data)
    cols = [c["id"] for c in table["cols"]]
    idx = {c: i for i, c in enumerate(cols)}
    rows = []
    for r in table["rows"]:
        v = [c.get("v") if c else None for c in r["c"]]
        rows.append(v)
    rows.sort(key=lambda v: -(v[idx["total_self_time"]] or 0))
    tot = sum((v[idx["total_self_time"]] or 0) for v in rows)
    print(f"# total device self time: {tot/1e3/args.trace_steps:.2f} ms/step")
    print(f"{'category':<22s} {'op':<48s} {'ms/step':>8s} {'%':>5s} {'bound':>6s} {'occ':>4s}")
    for v in rows[: args.top]:
        name = (v[idx["hlo_op_name"]] or "")[:48]
        cat = (v[idx["category"]] or "")[:22]
        t = (v[idx["total_self_time"]] or 0) / 1e3 / args.trace_steps
        pct = 100.0 * (v[idx["total_self_time"]] or 0) / max(tot, 1)
        bound = (v[idx["bound_by"]] or "")[:6]
        occ = int(v[idx["occurrences"]] or 0)
        print(f"{cat:<22s} {name:<48s} {t:8.3f} {pct:5.1f} {bound:>6s} {occ:>4d}")

    # Category rollup.
    agg = {}
    for v in rows:
        cat = v[idx["category"]] or "?"
        agg[cat] = agg.get(cat, 0) + (v[idx["total_self_time"]] or 0)
    print("\n# by category (ms/step):")
    for cat, t in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<28s} {t/1e3/args.trace_steps:8.3f}")


if __name__ == "__main__":
    main()
