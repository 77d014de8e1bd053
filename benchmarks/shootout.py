"""Preset shoot-out on the synthetic multi-view dataset.

Trains both method presets (and occupancy on/off variants of the
flagship) through the REAL dataset/CLI path, then prints a quality +
throughput table — the head-to-head the reference README claims
("tetra-nerf is faster and better than tetra-nerf-original",
``/root/reference/README.md:20-22``) and the occupancy-vs-off image-level
parity check.

Each run is a subprocess (clean device memory + compile cache reuse).

Usage: python benchmarks/shootout.py [--steps 20000] [--out /tmp/shootout]
           [--dataset /tmp/sphere_ds] [--configs a,b,...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "tetra-nerf": ["--method", "tetra-nerf"],
    "tetra-nerf-no-occ": ["--method", "tetra-nerf", "--no-occupancy"],
    "tetra-nerf-skip": ["--method", "tetra-nerf", "--skip-grid", "64"],
    "tetra-nerf-original": ["--method", "tetra-nerf-original"],
}


def run_one(name, extra, dataset, out_root, steps):
    out_dir = os.path.join(out_root, name)
    log_path = os.path.join(out_root, f"{name}.log")
    cmd = [
        sys.executable, "-u", "-c",
        "import sys; sys.path.insert(0, %r); "
        "from tetranerf_tpu.training.cli import main; main(sys.argv[1:])"
        % REPO,
        "--data", dataset,
        "--tetrahedra-path", os.path.join(dataset, "tetra.npz"),
        "--output-dir", out_dir,
        "--max-num-iterations", str(steps),
        "--steps-per-eval-batch", str(steps // 4),
        "--steps-per-eval-image", str(steps // 2),
        "--steps-per-eval-all-images", str(steps),
        "--log-every", "500",
        *extra,
    ]
    t0 = time.time()
    with open(log_path, "w") as log:
        proc = subprocess.run(
            cmd, stdout=log, stderr=subprocess.STDOUT, cwd=REPO
        )
    wall = time.time() - t0
    result = {"name": name, "wall_s": round(wall, 1), "ok": proc.returncode == 0}
    metrics_path = os.path.join(out_dir, "eval_metrics.json")
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            result.update(json.load(f))
    # Steady-state rays/s: median of the logged step lines' rays/s over
    # the second half of training (warm bounds, warm occupancy).
    rates = []
    with open(log_path) as f:
        for line in f:
            m = re.search(r"rays/s=([0-9_,.]+)", line)
            if m:
                rates.append(float(m.group(1).replace(",", "").replace("_", "")))
    if rates:
        tail = rates[len(rates) // 2:]
        result["rays_per_sec"] = sorted(tail)[len(tail) // 2]
    return result


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="/tmp/sphere_ds")
    p.add_argument("--out", default="/tmp/shootout")
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--side", type=int, default=256)
    p.add_argument("--points", type=int, default=100000)
    p.add_argument("--configs", default=None,
                   help="comma-separated subset of: " + ",".join(CONFIGS))
    args = p.parse_args()

    if not os.path.exists(os.path.join(args.dataset, "tetra.npz")):
        print(f"# generating dataset at {args.dataset} ...", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "benchmarks",
                                          "make_synthetic_dataset.py"),
             "--out", args.dataset, "--side", str(args.side),
             "--points", str(args.points)],
            check=True, cwd=REPO,
        )

    os.makedirs(args.out, exist_ok=True)
    names = (args.configs.split(",") if args.configs else list(CONFIGS))
    results = []
    for name in names:
        print(f"# running {name} ({args.steps} steps) ...", flush=True)
        r = run_one(name, CONFIGS[name], args.dataset, args.out, args.steps)
        print(json.dumps(r), flush=True)
        results.append(r)

    print(f"\n| config | psnr | mipnerf_ssim | rays/s | wall (min) |")
    print("|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['name']} | {r.get('psnr', float('nan')):.2f} "
            f"| {r.get('mipnerf_ssim', float('nan')):.4f} "
            f"| {r.get('rays_per_sec', 0):,.0f} "
            f"| {r['wall_s'] / 60:.1f} |"
        )
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
