#!/bin/bash
# MAD stage-1 sparse adapter tuning (reference scripts/mad/stage1_sparse.sh).
set -e
python -m revisionllm_tpu.train.train_cli \
    --preset stage1_sparse \
    --model_base "${MODEL_BASE:?}" \
    --data_path "${DATA:-data/mad/mad_train.json}" \
    --feat_folder "${FEATS:-data/mad/frames_5fps.rvfs}" \
    --q_feat_dir "${QFEATS:-data/mad/text_features.rvfs}" \
    --output_dir "${OUT_DIR:-checkpoints/mad_stage1_sparse}" \
    --dp "${DP:-1}" --fsdp "${FSDP:-4}" --tp "${TP:-1}" \
    "$@"
