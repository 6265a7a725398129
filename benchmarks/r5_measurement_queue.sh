#!/bin/bash
# Round-5 TPU measurement queue (VERDICT r4 "Next round" items 1, 4, 5).
#
# Waits for the TPU to come back (the probe loop writes /tmp/tpu_up when a
# real device matmul succeeds), then runs every outstanding measurement
# SEQUENTIALLY — stacked TPU jobs congest the tunnel (CLAUDE.md). Ordered by
# verdict priority (item 1a/1b/1c first) so the highest-value results
# survive if the TPU window is short. Each step tees to its own log.
#
# Launch:  nohup bash benchmarks/r5_measurement_queue.sh \
#              > benchmarks/r5_queue.log 2>&1 &  echo $! > /tmp/r5_queue.pid
set -u
cd "$(dirname "$0")/.."

step() {  # step <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] START $name (timeout ${tmo}s)"
  timeout "$tmo" "$@"
  echo "=== [$(date +%H:%M:%S)] END $name rc=$?"
}

echo "[$(date +%H:%M:%S)] waiting for /tmp/tpu_up (probe loop)..."
while [ ! -f /tmp/tpu_up ]; do sleep 60; done
echo "[$(date +%H:%M:%S)] TPU is up: $(cat /tmp/tpu_up)"

# 1. Headline bench (single JSON line; its own bounded retries inside).
step bench 4200 python bench.py | tee benchmarks/bench_r5_early.json

# 2. MaxSim at production shapes (pure device compute, no staging) —
#    verdict item 1c.
step maxsim_prod 2400 python benchmarks/maxsim_prod_shapes.py \
  2>&1 | tee benchmarks/maxsim_prod_r5.log

# 3. Interleaved mid-size text-dispatch A/B (settles the r2->r3 QPS
#    question) — verdict item 1a.
step ab_midsize 7200 python benchmarks/ab_midsize.py \
  --models SigLIP-400M,MetaCLIP-H14 --sample-size 5000 --passes 4 \
  --out benchmarks/ab_midsize_r5.jsonl 2>&1 | tee benchmarks/ab_midsize_r5.log

# 4. Full 7-model evidence run with overlap staging (the round-5 full7) —
#    verdict item 1b; its log carries the staging-overlap split too.
step full7 14400 python main.py --dataset synthetic --arch-models --models all \
  --sample-size 5000 --bootstrap-iterations 1000 \
  --score-cache-dir benchmarks/score_cache_r5 \
  --output benchmarks/full7_r5.csv 2>&1 | tee benchmarks/full7_r5.log

# 5. Qwen3 single-chip decode + TP'd GRPO step cost — verdict item 4.
step qwen3_decode 3600 python benchmarks/qwen3_decode_bench.py \
  --size 4b --reps 3 2>&1 | tee benchmarks/qwen3_bench_r5.log

# 6. Streaming-overlap A/B on one mid-size model (VERDICT Weak #6): same
#    session, overlap on vs off; QPS + staging split from the logs.
step overlap_on 5400 python main.py --dataset synthetic --arch-models \
  --models SigLIP-400M --sample-size 5000 --bootstrap-iterations 200 \
  --overlap-staging --output benchmarks/overlap_on_r5.csv \
  2>&1 | tee benchmarks/overlap_on_r5.log
step overlap_off 5400 python main.py --dataset synthetic --arch-models \
  --models SigLIP-400M --sample-size 5000 --bootstrap-iterations 200 \
  --no-overlap-staging --output benchmarks/overlap_off_r5.csv \
  2>&1 | tee benchmarks/overlap_off_r5.log

# 7. Final headline bench for BENCH_r05 confidence.
step bench_final 4200 python bench.py | tee benchmarks/bench_r5_final.json

echo "[$(date +%H:%M:%S)] QUEUE COMPLETE"
