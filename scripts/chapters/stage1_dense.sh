#!/bin/bash
# MAD stage-1 dense grounding training (reference scripts/chapters/stage1_dense.sh:
# 8x A100, bs 128/dev, 5 epochs, lr 1e-4, window 125 s, 250 frames).
# TPU: one process drives the whole mesh — set --dp/--fsdp/--tp to the slice.
set -e
python -m revisionllm_tpu.train.train_cli \
    --preset stage1_dense \
    --model_base "${MODEL_BASE:?set MODEL_BASE to the Vicuna-7B dir}" \
    --pretrain_clip_adapter "${ADAPTER:-}" \
    --data_path "${DATA:-data/chapters/chapters_train.json}" \
    --feat_folder "${FEATS:-data/chapters/frames_2fps.rvfs}" \
    --q_feat_dir "${QFEATS:-data/chapters/text_features.rvfs}" \
    --output_dir "${OUT_DIR:-checkpoints/chapters_stage1_dense}" \
    --dp "${DP:-1}" --fsdp "${FSDP:-8}" --tp "${TP:-1}" \
    "$@"
