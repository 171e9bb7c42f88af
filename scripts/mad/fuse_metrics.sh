#!/bin/bash
# Fusion + final metrics (reference README.md:107: metric_retrieval_forward).
set -e
python -m revisionllm_tpu.eval.fusion \
    --grounding_path "${GROUNDING:-checkpoints/mad_stage1_dense}" \
    --retrieval_path "${RETRIEVAL:-checkpoints/mad_stage2_long_100}" \
    --retrieval_path2 "${RETRIEVAL2:-checkpoints/mad_stage2_long_33}" \
    "$@"
