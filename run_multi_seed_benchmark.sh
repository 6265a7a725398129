#!/usr/bin/env bash
# Multi-seed benchmark harness (reference run_multi_seed_benchmark.sh).
#
# The reference sed-patches SEED into the script and aggregates CSVs with
# embedded python (run_multi_seed_benchmark.sh:5-31, :41-97); here the v28
# runner handles seeding and "mean ± std" aggregation natively, so this
# wrapper just forwards configuration.
set -euo pipefail

RUNS="${RUNS:-5}"
MODELS="${MODELS:-all}"
SAMPLE_SIZE="${SAMPLE_SIZE:-1000}"
OUTPUT="${OUTPUT:-benchmark_multi_seed_results.csv}"
EXTRA_ARGS="${EXTRA_ARGS:-}"

echo "Multi-seed benchmark: runs=${RUNS} models=${MODELS} sample=${SAMPLE_SIZE}"
python -m multimodal_embedding_tpu.cli.multi_seed \
    --runs "${RUNS}" \
    --models "${MODELS}" \
    --sample-size "${SAMPLE_SIZE}" \
    --output "${OUTPUT}" \
    ${EXTRA_ARGS}

echo "Aggregated results (mean ± std over ${RUNS} seeds):"
python - "$OUTPUT" <<'EOF'
import sys
import pandas as pd

print(pd.read_csv(sys.argv[1]).to_string(index=False))
EOF
