#!/bin/bash
# Round-5 TPU measurement queue, part 5: re-run of the three TPU evidence
# runs whose results were lost when the host VM restarted mid-queue
# (2026-08-18 ~13:19; *.log is gitignored and the CSV outputs had not
# landed). Order follows VERDICT-r4 priority: full7 first, then qwen3
# decode, then the clean overlap-on arm. 300 s TPU-idle gaps between
# clients for server-side HBM reclaim (CLAUDE.md).
#
# Launch:  nohup bash benchmarks/r5_measurement_queue5.sh \
#              > benchmarks/r5_queue5.log 2>&1 &  echo $! > /tmp/r5_queue5.pid
set -u
set -o pipefail
cd "$(dirname "$0")/.."

step() {  # step <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] START $name (timeout ${tmo}s)"
  timeout "$tmo" "$@"
  echo "=== [$(date +%H:%M:%S)] END $name rc=$?"
}

# full7 evidence run (VERDICT item 1b), after the streaming-stager HBM fix
# (both earlier attempts OOM'd ColPali-first on the duplicated image cache).
step full7 14400 python main.py --dataset synthetic --arch-models --models all \
  --sample-size 5000 --bootstrap-iterations 1000 \
  --score-cache-dir benchmarks/score_cache_r5d \
  --output benchmarks/full7_r5.csv 2>&1 | tee benchmarks/full7_r5d.log

sleep 300

# Qwen3 decode bench (VERDICT item 4).
step qwen3_decode 3600 python benchmarks/qwen3_decode_bench.py \
  --size 4b --reps 3 2>&1 | tee benchmarks/qwen3_bench_r5d.log

sleep 300

# Clean overlap-on arm (VERDICT item 5): the committed overlap_on_r5.csv is
# the host-contended arm (pytest ran during its timed encode).
step overlap_on_clean 5400 python main.py --dataset synthetic --arch-models \
  --models SigLIP-400M --sample-size 5000 --bootstrap-iterations 200 \
  --overlap-staging --output benchmarks/overlap_on_r5.csv \
  2>&1 | tee benchmarks/overlap_on_r5d.log

echo "[$(date +%H:%M:%S)] QUEUE5 COMPLETE"
