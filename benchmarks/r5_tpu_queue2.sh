#!/bin/bash
# Round-5 session-2 remaining on-TPU queue (tunnel restored 07:43).
# Stage order favors the measurements the verdict asked for, sized to
# fit the session wall clock; each stage logs to /tmp/r5q2_*.log and
# the script keeps going on individual failures.
set -u
cd "$(dirname "$0")/.."
log() { echo "[r5q2 $(date +%H:%M:%S)] $*"; }

log "stage 1: warm baseline (validates the snapshot + rank-consistent retune number)"
timeout 900 python -u benchmarks/profile_warm.py \
    --snap /tmp/warm_sphere_v5 --steps 30 > /tmp/r5q2_base.log 2>&1

log "stage 2: fused two-hop march A/B"
timeout 1200 python -u benchmarks/profile_warm.py \
    --snap /tmp/warm_sphere_v5 --steps 30 --set traversal_hops=2 \
    > /tmp/r5q2_hops2.log 2>&1

log "stage 3: 16k-ray batch at the better hops setting"
timeout 900 python -u benchmarks/profile_warm.py \
    --snap /tmp/warm_sphere_v5 --steps 30 --rays 16384 \
    > /tmp/r5q2_16k.log 2>&1

log "stage 4: dense-1M on-device bench (short warmup: first on-device number)"
timeout 2700 python -u bench.py --points 1000000 --warmup-steps 900 \
    --min-warmup 384 > /tmp/r5q2_dense1m.log 2>&1

log "queue done"
