#!/bin/bash
# Full MMIMDB + MOSI pretrain->finetune reproductions (BASELINE.md rows 6-8
# and the MOSI qualitative pipeline), driven by the REFERENCE configs
# unchanged, on learnable synthetic data at real scale
# (scripts/make_synthetic_{mmimdb,mosi}.py). Both arms of each comparison run
# in the same execution mode. Run on the real TPU:
#   bash scripts/repro_pipelines.sh [run_id]
set -e
cd "$(dirname "$0")/.."
export EXP_PATH="$PWD"
RID="${1:-1}"
REF=/root/reference/MML_Suite/configs

run() {
  echo "=== [$(date +%H:%M:%S)] $*"
  "$@"
}

# The reference *_pretrained.yaml configs hardcode the mono artifacts at
# models/1 (e.g. mosi/centralised/utt_fusion_pretrained.yaml:16-18); when
# this sweep runs under a different run id, mirror the encoder artifacts
# there so the finetune arm finds them (they are run-id-independent: the
# seed comes from the experiment config, the run id only names paths).
stage_encoders() { # stage_encoders <experiment_dir_prefix>...
  [ "$RID" = 1 ] && return 0
  for exp in "$@"; do
    d="experiments_output/${exp}/models"
    mkdir -p "$d/1"
    cp -f "$d/$RID"/encoder_*_best.ckpt "$d/1/" 2>/dev/null || true
  done
}

# -- data (idempotent) -------------------------------------------------------
[ -f DATA/mmimdb/train.hdf5 ] || run python scripts/make_synthetic_mmimdb.py
[ -f DATA/mosi/aligned_50.pkl ] || run python scripts/make_synthetic_mosi.py

# -- MM-IMDb: mono pretrains -> scratch vs pretrained finetune ---------------
run python -m mmtpu.cli.train_monomodal --config $REF/mmimdb/mono/mmimdb_image_encoder.yaml --run_id $RID
run python -m mmtpu.cli.train_monomodal --config $REF/mmimdb/mono/mmimdb_text_encoder.yaml --run_id $RID
stage_encoders MMIMDb_Image_Encoder_Pretrain MMIMDb_Text_Encoder_Pretrain
run python -m mmtpu.cli.train_multimodal --config $REF/mmimdb/centralised/mmimdb_baseline.yaml --run_id $RID
run python -m mmtpu.cli.train_multimodal --config $REF/mmimdb/centralised/mmimdb_pretrained.yaml --run_id $RID

# -- MOSI: mono pretrains -> scratch vs pretrained UttFusion -----------------
run python -m mmtpu.cli.train_monomodal --config $REF/mosi/mono/mosi_audio_encoder.yaml --run_id $RID
run python -m mmtpu.cli.train_monomodal --config $REF/mosi/mono/mosi_text_encoder.yaml --run_id $RID
run python -m mmtpu.cli.train_monomodal --config $REF/mosi/mono/mosi_video_encoder.yaml --run_id $RID
stage_encoders MOSI_Audio_Encoder_Pretrain MOSI_Text_Encoder_Pretrain MOSI_Video_Encoder_Pretrain
run python -m mmtpu.cli.train_multimodal --config $REF/mosi/centralised/utt_fusion_base_training.yaml --run_id $RID
run python -m mmtpu.cli.train_multimodal --config $REF/mosi/centralised/utt_fusion_pretrained.yaml --run_id $RID

echo "=== repro pipelines complete"
