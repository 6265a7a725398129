#!/bin/bash
# Round-5 TPU measurement queue, part 4: the full7 evidence run, after the
# streaming-cache HBM fix (AsyncImageStager.wait now assembles the
# monolithic cache at the model-2 handoff instead of holding a second full
# copy of the images during model 1 — both earlier full7 attempts OOM'd
# ColPali-first exactly there).
#
# Launched manually AFTER tests + /verify pass in the TPU-quiet window.
#
# Launch:  nohup bash benchmarks/r5_measurement_queue4.sh \
#              > benchmarks/r5_queue4.log 2>&1 &  echo $! > /tmp/r5_queue4.pid
set -u
set -o pipefail
cd "$(dirname "$0")/.."

step() {  # step <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] START $name (timeout ${tmo}s)"
  timeout "$tmo" "$@"
  echo "=== [$(date +%H:%M:%S)] END $name rc=$?"
}

echo "[$(date +%H:%M:%S)] waiting for queue 3 (QUEUE3 COMPLETE in r5_queue3.log)..."
while ! grep -q "QUEUE3 COMPLETE" benchmarks/r5_queue3.log; do sleep 60; done
echo "[$(date +%H:%M:%S)] queue 3 done; idling 300s for HBM reclaim"
sleep 300

step full7 14400 python main.py --dataset synthetic --arch-models --models all \
  --sample-size 5000 --bootstrap-iterations 1000 \
  --score-cache-dir benchmarks/score_cache_r5c \
  --output benchmarks/full7_r5.csv 2>&1 | tee benchmarks/full7_r5c.log

echo "[$(date +%H:%M:%S)] QUEUE4 COMPLETE"
