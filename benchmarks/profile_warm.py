"""Profile the WARM steady-state train step from a warm_snapshot.py
snapshot: wall-clock steady step + exact per-HLO-op device self-times.

The bench's steady state (collapsed crossings, tuned bucket bounds)
takes ~1300 steps to reach; this restores it in seconds, so kernel
experiments iterate at trace speed. Config overrides are applied at
trainer build (the warm state — params, EMA, bounds — is
config-independent), e.g.::

    python benchmarks/profile_warm.py --snap /tmp/warm_sphere \
        --set interp_mode=matmul --set grad_stream_budget_per_ray=300

Usage: python -u benchmarks/profile_warm.py [--snap /tmp/warm_sphere]
           [--trace] [--top 40] [--set key=value ...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def _parse_override(kv: str):
    k, v = kv.split("=", 1)
    for cast in (int, float):
        try:
            return k, cast(v)
        except ValueError:
            pass
    if v in ("true", "True", "false", "False"):
        return k, v in ("true", "True")
    if v in ("none", "None"):
        return k, None
    return k, v


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--snap", default="/tmp/warm_sphere")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--trace", action="store_true",
                   help="also capture an XLA trace + HLO op table")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--trace-steps", type=int, default=3)
    p.add_argument("--out", default="/tmp/tnerf_trace_warm")
    p.add_argument("--set", action="append", default=[],
                   metavar="KEY=VALUE", help="model-config override")
    p.add_argument("--buckets", default=None,
                   help="comma-separated inner bucket bounds (overrides "
                        "the snapshot's tuned tuple; pair with --set "
                        "ray_buckets=K for K-1 bounds)")
    p.add_argument("--rays", type=int, default=None,
                   help="rays per batch (default: the snapshot's)")
    p.add_argument("--recalibrate", action="store_true",
                   help="re-run the transmittance retune after restore "
                        "(re-derives the termination cap + bounds under "
                        "the overridden config, e.g. occ_cap_percentile)")
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from warm_snapshot import restore_trainer

    overrides = dict(_parse_override(kv) for kv in args.set)
    if overrides:
        print(f"# overrides: {overrides}")
    trainer, make_batch = restore_trainer(
        args.snap, overrides, rays=args.rays
    )
    if args.buckets:
        trainer.tuned_bucket_steps = tuple(
            int(b) for b in args.buckets.split(",")
        )
        trainer._build_steps()
    if args.recalibrate:
        trainer.retune_with_transmittance(make_batch())
    print(
        f"# warm state: bound={trainer.tuned_max_steps} "
        f"buckets={trainer.tuned_bucket_steps} "
        f"occ_cap={trainer._occ_cap:.1f}"
    )

    batches = [make_batch() for _ in range(4)]
    # Compile + settle (the first step also runs the occupancy update).
    for b in batches:
        m = trainer.train_step(b)
    float(m["loss"])
    for b in batches:
        m = trainer.train_step(b)
    float(m["loss"])

    t0 = time.perf_counter()
    for i in range(args.steps):
        m = trainer.train_step(batches[i % 4])
    float(m["loss"])
    dt = (time.perf_counter() - t0) / args.steps
    rays = batches[0]["origins"].shape[0]
    print(
        f"# steady step: {dt*1e3:.1f} ms ({rays/dt:,.0f} rays/s) "
        f"loss={float(m['loss']):.4f} "
        f"overflow={int(m.get('overflow_rays', 0))}"
    )

    if not args.trace:
        return

    shutil.rmtree(args.out, ignore_errors=True)
    jax.profiler.start_trace(args.out)
    for i in range(args.trace_steps):
        m = trainer.train_step(batches[i % 4])
    float(m["loss"])
    jax.profiler.stop_trace()

    paths = glob.glob(f"{args.out}/**/*.xplane.pb", recursive=True)
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
    print(
        f"{'category':<22s} {'op':<48s} {'ms/step':>8s} {'%':>5s} "
        f"{'bound':>6s} {'occ':>4s}"
    )
    for v in rows[: args.top]:
        name = (v[idx["hlo_op_name"]] or "")[:48]
        cat = (v[idx["category"]] or "")[:22]
        t = (v[idx["total_self_time"]] or 0) / 1e3 / args.trace_steps
        pct = 100.0 * (v[idx["total_self_time"]] or 0) / max(tot, 1)
        bound = (v[idx["bound_by"]] or "")[:6]
        occ = int(v[idx["occurrences"]] or 0)
        print(f"{cat:<22s} {name:<48s} {t:8.3f} {pct:5.1f} {bound:>6s} {occ:>4d}")

    agg = {}
    for v in rows:
        cat = v[idx["category"]] or "?"
        agg[cat] = agg.get(cat, 0) + (v[idx["total_self_time"]] or 0)
    print("\n# by category (ms/step):")
    for cat, t in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<28s} {t/1e3/args.trace_steps:8.3f}")


if __name__ == "__main__":
    main()
