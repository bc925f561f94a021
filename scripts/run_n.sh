#!/usr/bin/env bash
# Repeat a config N times with run_id 1..N (reference: run_n.sh).
# Usage: scripts/run_n.sh <config.yaml> <N> [entry=train_multimodal]
set -euo pipefail
CONFIG=${1:?usage: run_n.sh <config> <N> [entry]}
N=${2:?usage: run_n.sh <config> <N> [entry]}
ENTRY=${3:-train_multimodal}
for RUN_ID in $(seq 1 "$N"); do
  echo "=== run ${RUN_ID}/${N}: ${CONFIG} ==="
  python -m "mmtpu.cli.${ENTRY}" --config "$CONFIG" --run_id "$RUN_ID"
done
