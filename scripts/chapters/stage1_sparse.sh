#!/bin/bash
# MAD stage-1 sparse adapter tuning (reference scripts/chapters/stage1_sparse.sh).
set -e
python -m revisionllm_tpu.train.train_cli \
    --preset stage1_sparse \
    --model_base "${MODEL_BASE:?}" \
    --data_path "${DATA:-data/chapters/chapters_train.json}" \
    --feat_folder "${FEATS:-data/chapters/frames_2fps.rvfs}" \
    --q_feat_dir "${QFEATS:-data/chapters/text_features.rvfs}" \
    --output_dir "${OUT_DIR:-checkpoints/chapters_stage1_sparse}" \
    --dp "${DP:-1}" --fsdp "${FSDP:-4}" --tp "${TP:-1}" \
    "$@"
