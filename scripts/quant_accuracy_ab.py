"""Serving-quantization accuracy A/B on a TRAINED checkpoint (VERDICT r4 #3).

scripts/validate_quant.py bounded W8A8/KV8 logit perturbation on synthetic
weights; this script measures what actually matters — held-out grounding
R@1/mIoU — on a model that REALLY grounds (the synthetic learning demo's
stage-1 checkpoint, LEARNING.md). Each serving config runs the full
eval/stage1.py CLI in a fresh subprocess (the quant switches are read once
per process) over the same val set; the table is the accuracy evidence for
the int8 + W8A8 + KV8 serving defaults (reference anchor: the int8 path
chatglm/quantization.py:43+ ships with no accuracy table at all).

Usage (after scripts/synthetic_learning_demo.py left a work_dir):
  PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/quant_accuracy_ab.py \
      --demo_dir /tmp/synth5c [--configs ...]

Prints one JSON line with per-config metrics + deltas vs bf16.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

CONFIGS = {
    # name -> env overrides (everything else inherited)
    "bf16": {
        "REVISIONLLM_QUANT": "none", "REVISIONLLM_W8A8": "0",
        "REVISIONLLM_KV8": "0", "REVISIONLLM_ATTN_BF16": "0",
    },
    "int8_w8a16": {
        "REVISIONLLM_QUANT": "int8", "REVISIONLLM_W8A8": "0",
        "REVISIONLLM_KV8": "0", "REVISIONLLM_ATTN_BF16": "0",
    },
    "int8_w8a8": {
        "REVISIONLLM_QUANT": "int8", "REVISIONLLM_W8A8": "1",
        "REVISIONLLM_KV8": "0", "REVISIONLLM_ATTN_BF16": "0",
    },
    "int8_w8a8_kv8": {
        "REVISIONLLM_QUANT": "int8", "REVISIONLLM_W8A8": "1",
        "REVISIONLLM_KV8": "1", "REVISIONLLM_ATTN_BF16": "0",
    },
    # the shipped TPU serving default + the round-5 bf16-score attention
    "int8_w8a8_kv8_attnbf16": {
        "REVISIONLLM_QUANT": "int8", "REVISIONLLM_W8A8": "1",
        "REVISIONLLM_KV8": "1", "REVISIONLLM_ATTN_BF16": "1",
    },
}


def run_config(name: str, env_over: dict, demo_dir: str, out_dir: str) -> dict:
    corpus = os.path.join(demo_dir, "corpus")
    hf = os.path.join(demo_dir, "hf")
    s1 = os.path.join(demo_dir, "stage1")
    log_dir = os.path.join(out_dir, name)
    code = f"""
import json
from revisionllm_tpu.eval import stage1
from revisionllm_tpu.eval import metrics as M
stage1.main([
    "--model_base", {hf!r}, "--stage2", {s1!r},
    "--data_path", {os.path.join(corpus, 'val.json')!r},
    "--feat_folder", {os.path.join(corpus, 'features')!r},
    "--q_feat_dir", {os.path.join(corpus, 'queries')!r},
    "--log_path", {log_dir!r},
    "--debug_window", "90", "--num_frames", "16", "--feature_fps", "1",
    "--max_new_tokens", "8", "--batch", "8", "--debug", "True",
    "--skip_small_videos", "False",
])
logs = M.load_prediction_logs({log_dir!r}, distributed=1)
m = M.grounding_metrics_stream(logs)
print("ABRESULT " + json.dumps(m))
"""
    env = dict(os.environ)
    env.update(env_over)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.setdefault("JAX_PLATFORMS", "cpu")
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"{name}: eval subprocess failed rc={proc.returncode}\n"
        f"{proc.stderr[-2000:]}"
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--demo_dir", default="/tmp/synth5c")
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--configs", type=str, default=",".join(CONFIGS))
    args = ap.parse_args(argv)

    out_dir = args.out_dir or os.path.join(args.demo_dir, "quant_ab")
    os.makedirs(out_dir, exist_ok=True)

    table = {}
    for name in args.configs.split(","):
        print(f"[ab] {name} ...", file=sys.stderr, flush=True)
        table[name] = run_config(name, CONFIGS[name], args.demo_dir, out_dir)

    base = table.get("bf16", {})
    summary = {}
    for name, m in table.items():
        summary[name] = {
            "R1@0.3": round(m.get("R1@0.3", 0.0), 1),
            "R1@0.5": round(m.get("R1@0.5", 0.0), 1),
            "mIoU": round(m.get("mIoU", 0.0), 1),
        }
        if base and name != "bf16":
            summary[name]["dR1@0.5_vs_bf16"] = round(
                m.get("R1@0.5", 0.0) - base.get("R1@0.5", 0.0), 1
            )
    with open(os.path.join(out_dir, "quant_ab.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
