#!/bin/bash
# MAD stage-2 hierarchical eval, 100 windows/call
# (reference scripts/chapters/eval_stage2_100.sh: stride 5, zooms 4/2/1).
set -e
python -m revisionllm_tpu.eval.stage2 \
    --model_base "${MODEL_BASE:?}" \
    --stage2 "${STAGE2:-checkpoints/chapters_stage2_long_100}" \
    --pretrain_clip_adapter "${ADAPTER:-checkpoints/chapters_stage1_sparse/non_lora_trainables.bin}" \
    --data_path "${DATA:-data/chapters/MAD_val.json}" \
    --feat_folder "${FEATS:-data/chapters/frames_2fps.rvfs}" \
    --q_feat_dir "${QFEATS:-data/chapters/text_features.rvfs}" \
    --log_path "${OUT_DIR:-checkpoints/chapters_stage2_long_100}" \
    --grounding_path "${GROUNDING:-}" \
    --debug_window 500 --num_frames 250 --feature_fps 2 --stride 5 \
    --batch 100 --split "${SPLIT:-0}" --total_split "${TOTAL_SPLIT:-1}" \
    "$@"
