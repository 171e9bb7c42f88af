#!/bin/bash
# MAD stage-1 dense eval (reference scripts/mad/eval_stage1_dense.sh).
# One TPU process replaces the 16-shard SLURM array; use SPLIT/TOTAL_SPLIT for
# multi-host sharding.
set -e
python -m revisionllm_tpu.eval.stage1 \
    --model_base "${MODEL_BASE:?}" \
    --stage2 "${STAGE2:-checkpoints/mad_stage1_dense}" \
    --data_path "${DATA:-data/mad/MAD_val.json}" \
    --feat_folder "${FEATS:-data/mad/frames_5fps.rvfs}" \
    --q_feat_dir "${QFEATS:-data/mad/text_features.rvfs}" \
    --log_path "${OUT_DIR:-checkpoints/mad_stage1_dense}" \
    --debug_window 125 --num_frames 250 --feature_fps 5 \
    --batch "${BATCH:-64}" --split "${SPLIT:-0}" --total_split "${TOTAL_SPLIT:-1}" \
    "$@"
