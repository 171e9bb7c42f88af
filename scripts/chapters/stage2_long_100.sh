#!/bin/bash
# MAD stage-2 hierarchical retrieval training, 100 windows
# (reference scripts/chapters/stage2_long_100.sh: training_stage 4, frozen adapter).
set -e
python -m revisionllm_tpu.train.train_cli \
    --preset stage2_long_100 \
    --model_base "${MODEL_BASE:?}" \
    --pretrain_clip_adapter "${ADAPTER:-checkpoints/chapters_stage1_sparse/non_lora_trainables.bin}" \
    --stage2_path "${STAGE2:-checkpoints/chapters_stage1_dense}" \
    --data_path "${DATA:-data/chapters/chapters_stage2.json}" \
    --feat_folder "${FEATS:-data/chapters/frames_2fps.rvfs}" \
    --q_feat_dir "${QFEATS:-data/chapters/text_features.rvfs}" \
    --output_dir "${OUT_DIR:-checkpoints/chapters_stage2_long_100}" \
    --dp "${DP:-1}" --fsdp "${FSDP:-8}" --tp "${TP:-1}" \
    "$@"
