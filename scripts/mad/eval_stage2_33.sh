#!/bin/bash
# MAD stage-2 hierarchical eval, 33 windows/call
# (reference scripts/mad/eval_stage2_33.sh: stride 5, zooms 4/2/1).
set -e
python -m revisionllm_tpu.eval.stage2 \
    --model_base "${MODEL_BASE:?}" \
    --stage2 "${STAGE2:-checkpoints/mad_stage2_long_33}" \
    --pretrain_clip_adapter "${ADAPTER:-checkpoints/mad_stage1_sparse/non_lora_trainables.bin}" \
    --data_path "${DATA:-data/mad/MAD_val.json}" \
    --feat_folder "${FEATS:-data/mad/frames_5fps.rvfs}" \
    --q_feat_dir "${QFEATS:-data/mad/text_features.rvfs}" \
    --log_path "${OUT_DIR:-checkpoints/mad_stage2_long_33}" \
    --grounding_path "${GROUNDING:-}" \
    --debug_window 125 --num_frames 250 --feature_fps 5 --stride 5 \
    --batch 33 --split "${SPLIT:-0}" --total_split "${TOTAL_SPLIT:-1}" \
    "$@"
