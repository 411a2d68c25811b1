#!/bin/bash
# Wait for the axon TPU relay to come back, then run the queued TPU jobs
# in order (each bounded; relay flakiness documented in NOTES_ROUND2.md):
#   1. v3-vs-v1 parity incl. the fused color plane -> /tmp/tpu_parity.log
#   2. fused 92-pair benchmark headline -> benchmark_dryrun.json (merged)
#   3. bench.py sanity -> /tmp/tpu_bench.log
# Usage: bash scripts/tpu_queue.sh [max_probe_hours]
set -u
cd "$(dirname "$0")/.."
# AXON_SITE: where the machine's TPU plugin lives (skipped if absent so
# the script stays portable to hosts without the relay plugin)
AXON_SITE=${AXON_SITE:-/root/.axon_site}
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"
[ -d "$AXON_SITE" ] && export PYTHONPATH="$PYTHONPATH:$AXON_SITE"
MAX_H=${1:-10}
LOG=/tmp/tpu_queue.log
echo "$(date -u +%FT%TZ) tpu_queue start (max ${MAX_H}h probing)" >> "$LOG"

deadline=$(( $(date +%s) + MAX_H * 3600 ))
while true; do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) relay ALIVE" >> "$LOG"
    break
  fi
  if [ "$(date +%s)" -ge "$deadline" ]; then
    echo "$(date -u +%FT%TZ) gave up probing" >> "$LOG"
    exit 1
  fi
  echo "$(date -u +%FT%TZ) relay down; retry in 300s" >> "$LOG"
  sleep 300
done

echo "$(date -u +%FT%TZ) job 1: parity_v3_vs_v1" >> "$LOG"
timeout 2400 python scripts/parity_v3_vs_v1.py > /tmp/tpu_parity.log 2>&1
echo "$(date -u +%FT%TZ) job 1 rc=$?" >> "$LOG"

echo "$(date -u +%FT%TZ) job 2: fused 92-pair benchmark" >> "$LOG"
timeout 5400 python scripts/benchmark_dryrun.py --fused_only \
    > /tmp/tpu_fused.log 2>&1
echo "$(date -u +%FT%TZ) job 2 rc=$?" >> "$LOG"

echo "$(date -u +%FT%TZ) job 3: fused benchmark, batch_pairs=8" >> "$LOG"
timeout 5400 python scripts/benchmark_dryrun.py --fused_only \
    --batch_pairs 8 --out /root/repo/benchmark_dryrun_batched.json \
    > /tmp/tpu_fused_batched.log 2>&1
echo "$(date -u +%FT%TZ) job 3 rc=$?" >> "$LOG"

echo "$(date -u +%FT%TZ) job 4: bench.py" >> "$LOG"
timeout 1800 python bench.py > /tmp/tpu_bench.log 2>&1
echo "$(date -u +%FT%TZ) job 4 rc=$? done" >> "$LOG"
