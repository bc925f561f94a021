#!/bin/bash
# Re-runs after fixes: hardened MMIMDb data (4 phases), MOSI pretrained arm
# with netA/netV/netT encoder loading fixed, and the AVMNIST scratch vs
# pretrained main-phase comparison with BOTH arms in the same execution mode.
set -e
cd "$(dirname "$0")/.."
export EXP_PATH="$PWD"
REF=/root/reference/MML_Suite/configs
run() { echo "=== [$(date +%H:%M:%S)] $*"; "$@"; }

run python -m mmtpu.cli.train_monomodal --config $REF/mmimdb/mono/mmimdb_image_encoder.yaml --run_id 2
run python -m mmtpu.cli.train_monomodal --config $REF/mmimdb/mono/mmimdb_text_encoder.yaml --run_id 2
run python -m mmtpu.cli.train_multimodal --config $REF/mmimdb/centralised/mmimdb_baseline.yaml --run_id 2
run python -m mmtpu.cli.train_multimodal --config $REF/mmimdb/centralised/mmimdb_pretrained.yaml --run_id 2

run python -m mmtpu.cli.train_multimodal --config $REF/mosi/centralised/utt_fusion_base_training.yaml --run_id 2
run python -m mmtpu.cli.train_multimodal --config $REF/mosi/centralised/utt_fusion_pretrained.yaml --run_id 2

run python -m mmtpu.cli.train_multimodal --config configs/avmnist/multimodal_resnet_scratch.yaml --run_id 1
run python -m mmtpu.cli.train_multimodal --config configs/avmnist/multimodal_resnet_pretrained.yaml --run_id 1
echo "=== round2b repro complete"
