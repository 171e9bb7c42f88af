#!/bin/bash
# MAD stage-2 hierarchical retrieval training, 100 windows
# (reference scripts/mad/stage2_long_100.sh: training_stage 4, frozen adapter).
set -e
python -m revisionllm_tpu.train.train_cli \
    --preset stage2_long_100 \
    --model_base "${MODEL_BASE:?}" \
    --pretrain_clip_adapter "${ADAPTER:-checkpoints/mad_stage1_sparse/non_lora_trainables.bin}" \
    --stage2_path "${STAGE2:-checkpoints/mad_stage1_dense}" \
    --data_path "${DATA:-data/mad/mad_stage2.json}" \
    --feat_folder "${FEATS:-data/mad/frames_5fps.rvfs}" \
    --q_feat_dir "${QFEATS:-data/mad/text_features.rvfs}" \
    --output_dir "${OUT_DIR:-checkpoints/mad_stage2_long_100}" \
    --dp "${DP:-1}" --fsdp "${FSDP:-8}" --tp "${TP:-1}" \
    "$@"
