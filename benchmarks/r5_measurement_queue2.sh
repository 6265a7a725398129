#!/bin/bash
# Round-5 TPU measurement queue, part 2: reruns the two steps queue 1 lost
# to lagging server-side HBM reclaim (CLAUDE.md: RESOURCE_EXHAUSTED on every
# model load right after a previous axon client exits — wait idle minutes,
# do NOT rewrite code). Queue 1 ran its steps back-to-back with zero gap;
# this one sleeps 300 s of TPU idle between clients.
#
# Launch:  nohup bash benchmarks/r5_measurement_queue2.sh \
#              > benchmarks/r5_queue2.log 2>&1 &  echo $! > /tmp/r5_queue2.pid
set -u
set -o pipefail
cd "$(dirname "$0")/.."

step() {  # step <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] START $name (timeout ${tmo}s)"
  timeout "$tmo" "$@"
  echo "=== [$(date +%H:%M:%S)] END $name rc=$?"
}

echo "[$(date +%H:%M:%S)] waiting for queue 1 (QUEUE COMPLETE in r5_queue.log)..."
while ! grep -q "QUEUE COMPLETE" benchmarks/r5_queue.log; do sleep 60; done
echo "[$(date +%H:%M:%S)] queue 1 done; idling 300s for HBM reclaim"
sleep 300

# full7 rerun (VERDICT item 1b). Fresh score-cache dir: the r5a run died
# before scoring anything, and a stale cache would mask real encode timing.
step full7 14400 python main.py --dataset synthetic --arch-models --models all \
  --sample-size 5000 --bootstrap-iterations 1000 \
  --score-cache-dir benchmarks/score_cache_r5b \
  --output benchmarks/full7_r5.csv 2>&1 | tee benchmarks/full7_r5b.log

sleep 300

# Qwen3 decode rerun (VERDICT item 4).
step qwen3_decode 3600 python benchmarks/qwen3_decode_bench.py \
  --size 4b --reps 3 2>&1 | tee benchmarks/qwen3_bench_r5b.log

echo "[$(date +%H:%M:%S)] QUEUE2 COMPLETE"
