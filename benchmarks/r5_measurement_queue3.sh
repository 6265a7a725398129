#!/bin/bash
# Round-5 TPU measurement queue, part 3: clean rerun of the overlap-staging
# ON arm. The first overlap_on run's timed encode (11:05-11:06) coincided
# with a CPU-bound pytest run on the single host core — streaming dispatch
# starved and the encode read 59.3 s vs the 26.9 s cached-path measured the
# same morning. Rule reaffirmed: nothing CPU-heavy while a timed TPU phase
# runs.
#
# Launch:  nohup bash benchmarks/r5_measurement_queue3.sh \
#              > benchmarks/r5_queue3.log 2>&1 &  echo $! > /tmp/r5_queue3.pid
set -u
set -o pipefail
cd "$(dirname "$0")/.."

step() {  # step <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] START $name (timeout ${tmo}s)"
  timeout "$tmo" "$@"
  echo "=== [$(date +%H:%M:%S)] END $name rc=$?"
}

echo "[$(date +%H:%M:%S)] waiting for queue 2 (QUEUE2 COMPLETE in r5_queue2.log)..."
while ! grep -q "QUEUE2 COMPLETE" benchmarks/r5_queue2.log; do sleep 60; done
echo "[$(date +%H:%M:%S)] queue 2 done; idling 300s for HBM reclaim"
sleep 300

step overlap_on_clean 5400 python main.py --dataset synthetic --arch-models \
  --models SigLIP-400M --sample-size 5000 --bootstrap-iterations 200 \
  --overlap-staging --output benchmarks/overlap_on_r5.csv \
  2>&1 | tee benchmarks/overlap_on_r5b.log

echo "[$(date +%H:%M:%S)] QUEUE3 COMPLETE"
