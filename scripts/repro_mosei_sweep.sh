#!/usr/bin/env bash
# MOSEI missing-rate robustness sweep (thesis ch.3): UttFusion trained at
# missing_rate 0 / 0.25 / 0.5 / 0.75 / 0.9, evaluated over all 7 patterns.
# Reference configs are used UNCHANGED; data from make_synthetic_mosei.py.
#
#   EXP_PATH=$PWD bash scripts/repro_mosei_sweep.sh [run_id]
set -euo pipefail
RUN_ID="${1:-1}"
REF="${REF:-/root/reference/MML_Suite/configs/ch3_experiments/mosei}"
export EXP_PATH="${EXP_PATH:-$PWD}"

python -m mmtpu.cli.train_multimodal \
  --config "$REF/without_missing/utt_fusion_baseline_train.yaml" --run_id "$RUN_ID"
for r in 25 50 75 90; do
  python -m mmtpu.cli.train_multimodal \
    --config "$REF/with_missing/utt_fusion_baseline_train_$r.yaml" --run_id "$RUN_ID"
done

python scripts/plot_missing_sweep.py --run_id "$RUN_ID" \
  --experiments \
    "UTT_FUSION_BASE_MODEL_MOSEI:0" \
    "UTT_FUSION_BASE_MODEL_MOSEI_Missing_25:25" \
    "UTT_FUSION_BASE_MODEL_MOSEI_Missing_50:50" \
    "UTT_FUSION_BASE_MODEL_MOSEI_Missing_75:75" \
    "UTT_FUSION_BASE_MODEL_MOSEI_Missing_90:90" \
  --metric F1_Macro --out plots/mosei_missing_sweep.png
