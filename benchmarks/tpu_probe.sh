#!/bin/bash
# TPU probe loop: writes /tmp/tpu_up once a real device matmul succeeds,
# then exits (benchmarks/r5_measurement_queue.sh waits on that file).
#
# Probes GENTLY: a timed-out/SIGTERM'd axon client can wedge the tunnel for
# 20-40 min (CLAUDE.md), so use a generous per-probe timeout and a long
# sleep between failed attempts rather than hammering.
#
# Launch:  nohup bash benchmarks/tpu_probe.sh > benchmarks/tpu_probe.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

while true; do
  echo "=== [$(date +%H:%M:%S)] probing axon backend (timeout 600s)"
  if timeout 600 python benchmarks/tpu_probe_once.py; then
    date > /tmp/tpu_up
    echo "=== [$(date +%H:%M:%S)] TPU UP"
    exit 0
  fi
  echo "=== [$(date +%H:%M:%S)] probe failed (rc=$?); sleeping 600s"
  sleep 600
done
