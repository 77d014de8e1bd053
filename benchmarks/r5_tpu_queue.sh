#!/bin/bash
# Round-5 remaining on-TPU measurement queue — run unattended once the
# tunnel is back. Each stage logs to /tmp/r5q_*.log and the script
# keeps going on individual failures.
set -u
cd "$(dirname "$0")/.."
log() { echo "[r5q $(date +%H:%M:%S)] $*"; }

log "stage 0: device probe"
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

log "stage 1: warm snapshot (new retune)"
timeout 2400 python -u benchmarks/warm_snapshot.py \
    --out /tmp/warm_sphere_v5 --min-warmup 1900 --warmup-steps 2600 \
    > /tmp/r5q_snapshot.log 2>&1

log "stage 2: warm baseline + two-hop + 16k A/B"
for v in "" "--set traversal_hops=2" "--rays 16384" \
         "--set traversal_hops=2 --rays 16384"; do
  echo "=== $v" >> /tmp/r5q_ab.log
  timeout 1800 python -u benchmarks/profile_warm.py \
      --snap /tmp/warm_sphere_v5 --steps 40 --recalibrate $v 2>&1 \
      | grep -E "steady step|warm state" >> /tmp/r5q_ab.log
done

log "stage 3: final flagship bench validation (the round headline)"
timeout 3600 python -u bench.py > /tmp/r5q_bench_final.log 2>&1

log "stage 4: hard-scene quality A/B (5k steps x 2)"
timeout 7200 python -u benchmarks/quality_ab_hard.py --steps 5000 \
    > /tmp/r5q_hard_ab.log 2>&1

log "stage 5: dense-1M on-device bench"
timeout 5400 python -u bench.py --points 1000000 --warmup-steps 1200 \
    --min-warmup 512 > /tmp/r5q_dense1m.log 2>&1

log "queue done"
