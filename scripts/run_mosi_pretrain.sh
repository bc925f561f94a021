#!/usr/bin/env bash
# MOSI pipeline: 3 monomodal pretrains -> multimodal finetune
# (reference: run_mosi_pretrain.sh — whose monomodal driver was an empty
# stub as shipped; this one actually runs).
# Usage: scripts/run_mosi_pretrain.sh <config_dir> [run_id=1]
set -euo pipefail
DIR=${1:?usage: run_mosi_pretrain.sh <config_dir> [run_id]}
RUN_ID=${2:-1}
for MOD in audio video text; do
  CFG="$DIR/mono_${MOD}.yaml"
  [ -f "$CFG" ] && python -m mmtpu.cli.train_monomodal --config "$CFG" --run_id "$RUN_ID"
done
python -m mmtpu.cli.train_multimodal --config "$DIR/utt_fusion_pretrained.yaml" --run_id "$RUN_ID"
