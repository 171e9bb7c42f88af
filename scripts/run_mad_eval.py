"""One-command real-checkpoint MAD parity run: convert -> stage-1 -> stage-2
-> fusion -> R@K@IoU table.

The turnkey harness of RUNBOOK.md (VERDICT round-1 item 5): given the
reference's released artifacts (Vicuna-7B base, stage LoRA dirs,
non_lora_trainables) and the MAD features (h5 or RVFS) + annotations, this
reproduces the pipeline the reference runs as 3 SLURM script families
(scripts/mad/eval_stage1_dense.sh, eval_stage2_100.sh, then
revisionllm/eval/metric_retrieval_forward.py), in one process.

Example:
  python scripts/run_mad_eval.py \
      --model_base /data/vicuna-7b-v1.5 \
      --stage1_lora /data/checkpoints/stage1_dense \
      --stage2_lora /data/checkpoints/stage2_long_100 \
      --pretrain_clip_adapter /data/checkpoints/stage2_long_100/non_lora_trainables.bin \
      --frame_features /data/mad/CLIP_L14_frames_features_5fps.h5 \
      --text_features  /data/mad/CLIP_L14_language_tokens_features.h5 \
      --annotations    /data/mad/annotations/MAD_val.json \
      --out_dir /tmp/mad_eval

Each sub-stage resumes from its own JSONL logs, so an interrupted run picks
up where it stopped (reference eval_nlq_negative.py:157-165 semantics).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def ensure_rvfs(path: str, out_dir: str, name: str) -> str:
    """h5 / npy-dir inputs -> RVFS store (cached)."""
    if path.endswith(".rvfs") or os.path.isdir(path):
        return path
    out = os.path.join(out_dir, name + ".rvfs")
    if os.path.exists(out):
        print(f"[convert] reusing {out}", file=sys.stderr)
        return out
    from revisionllm_tpu.data.converters import h5_to_rvfs

    n = h5_to_rvfs(path, out)
    print(f"[convert] {path} -> {out} ({n} records)", file=sys.stderr)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_base", required=True)
    ap.add_argument("--stage1_lora", required=True,
                    help="grounding (stage-1 dense) LoRA dir")
    ap.add_argument("--stage2_lora", required=True,
                    help="retrieval (stage-2 long) LoRA dir")
    ap.add_argument("--stage3_lora", default=None)
    ap.add_argument("--pretrain_clip_adapter", default=None)
    ap.add_argument("--frame_features", required=True, help="h5 or .rvfs")
    ap.add_argument("--text_features", default=None, help="h5 or .rvfs")
    ap.add_argument("--annotations", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--debug_window", type=int, default=125)
    ap.add_argument("--num_frames", type=int, default=250)
    ap.add_argument("--feature_fps", type=float, default=5)
    ap.add_argument("--stage1_batch", type=int, default=64,
                    help="windows per stage-1 LLM call (64 = measured v5e "
                         "optimum under the int8+KV8 serving defaults)")
    ap.add_argument("--stage2_batch", type=int, default=100)
    ap.add_argument("--stride", type=int, default=5)
    ap.add_argument("--split", type=int, default=0)
    ap.add_argument("--total_split", type=int, default=1)
    ap.add_argument("--skip_stage1", action="store_true")
    ap.add_argument("--skip_stage2", action="store_true")
    ap.add_argument("--mesh", type=str, default=None,
                    help="dp,fsdp,tp mesh for GSPMD-sharded serving")
    ap.add_argument("--adapter_d_model", type=int, default=768)
    ap.add_argument("--adapter_heads", type=int, default=8)
    ap.add_argument("--adapter_layers", type=int, default=2)
    ap.add_argument("--adapter_ffn", type=int, default=2048)
    args = ap.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    frames = ensure_rvfs(args.frame_features, args.out_dir, "frames")
    texts = (
        ensure_rvfs(args.text_features, args.out_dir, "texts")
        if args.text_features else None
    )

    g_dir = os.path.join(args.out_dir, "grounding")
    r_dir = os.path.join(args.out_dir, "retrieval")
    common = [
        "--data_path", args.annotations,
        "--feat_folder", frames,
        "--debug_window", str(args.debug_window),
        "--num_frames", str(args.num_frames),
        "--feature_fps", str(args.feature_fps),
        "--split", str(args.split),
        "--total_split", str(args.total_split),
        "--model_base", args.model_base,
        "--adapter_d_model", str(args.adapter_d_model),
        "--adapter_heads", str(args.adapter_heads),
        "--adapter_layers", str(args.adapter_layers),
        "--adapter_ffn", str(args.adapter_ffn),
    ]
    if texts:
        common += ["--q_feat_dir", texts]
    if os.environ.get("RUNBOOK_DEBUG", "0") == "1":
        common += ["--debug", "True"]  # re-raise per-query errors
    if args.mesh:
        common += ["--mesh", args.mesh]

    if not args.skip_stage1:
        print("[stage-1] dense grounding ...", file=sys.stderr)
        from revisionllm_tpu.eval import stage1

        stage1.main(common + [
            "--log_path", g_dir,
            "--batch", str(args.stage1_batch),
            "--stage2", args.stage1_lora,
            *(["--stage3", args.stage3_lora] if args.stage3_lora else []),
        ])

    if not args.skip_stage2:
        print("[stage-2] hierarchical retrieval ...", file=sys.stderr)
        from revisionllm_tpu.eval import stage2

        stage2.main(common + [
            "--log_path", r_dir,
            "--batch", str(args.stage2_batch),
            "--stride", str(args.stride),
            "--stage2", args.stage2_lora,
            "--grounding_path", g_dir,
            "--distributed_retrieval", str(args.total_split),
            *(
                ["--pretrain_clip_adapter", args.pretrain_clip_adapter]
                if args.pretrain_clip_adapter else []
            ),
        ])

    print("[fusion] merging + metrics ...", file=sys.stderr)
    from revisionllm_tpu.eval import fusion

    metrics = fusion.main([
        "--grounding_path", g_dir,
        "--retrieval_path", r_dir,
        "--distributed_grounding", str(args.total_split),
        "--distributed_retrieval", str(args.total_split),
    ])
    out = os.path.join(args.out_dir, "result.json")
    with open(out, "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics, indent=2))
    print(f"[done] {out}", file=sys.stderr)
    return metrics


if __name__ == "__main__":
    main()
