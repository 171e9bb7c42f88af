"""7B QLoRA train-step probe on ONE v5e chip.

Measures the int8-frozen-base LoRA training step at the real stage-1
geometry (32 layers, full width, LoRA r=64 on all projections + ClipEncoder
adapter trainable, seq 2048, gradient checkpointing). Round-1 could only
project 32-layer step time from an 8-layer bf16 slice (BENCH_NOTES) because
a bf16 frozen 7B does not fit 16 GB; the int8 base (6.6 GB) + remat does.

  python scripts/train_7b_qlora_probe.py [--batch 1 --steps 5]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--num_videos", type=int, default=4)
    ap.add_argument("--frames", type=int, default=250)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from revisionllm_tpu.config import (
        AdapterConfig, LlamaConfig, LoraConfig, TrainConfig,
    )
    from revisionllm_tpu.constants import IMAGE_TOKEN_INDEX
    from revisionllm_tpu.models import llama, revisionllm
    from revisionllm_tpu.models.multimodal import build_splice_plan, stack_plans
    from revisionllm_tpu.ops.quant import quantize_llama_params
    from revisionllm_tpu.train import optimizer as opt_lib, trainer as trainer_lib

    cfg = LlamaConfig(num_layers=args.layers)
    acfg = AdapterConfig(
        clip_adapter_text=True, hierarchy=True, feature_mode="cls",
        hidden_size=cfg.hidden_size,
    )
    dtype = jnp.bfloat16

    # int8 zeros base (structure-correct; throughput is value-independent)
    shapes = jax.eval_shape(
        lambda k: quantize_llama_params(
            llama.init_params(cfg, k, dtype), quantize_lm_head=False
        ),
        jax.random.PRNGKey(0),
    )
    base = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    vision = revisionllm.init_vision_params(acfg, jax.random.PRNGKey(1), dtype=dtype)

    tcfg = TrainConfig(
        training_stage=2, lora=LoraConfig(r=64, alpha=128),
        gradient_checkpointing=True, per_device_batch_size=args.batch,
        learning_rate=1e-4,
    )
    trainable, frozen, _ = trainer_lib.build_trainable(
        cfg, tcfg, vision, jax.random.PRNGKey(2)
    )
    optimizer = opt_lib.make_optimizer(tcfg, total_steps=1000)
    opt_state = optimizer.init(trainable)

    B, V, T = args.batch, args.num_videos, args.frames
    prompt = [1] + list(range(100, 140)) + [IMAGE_TOKEN_INDEX] + list(range(140, 180))
    labels = [-100] * 41 + [-100] + [200] * 40
    plans = stack_plans(
        [build_splice_plan(prompt, V, args.seq, labels=labels) for _ in range(B)]
    )
    rng = np.random.default_rng(0)
    batch = {
        **{k: jnp.asarray(v) for k, v in plans.items()},
        "images": jnp.asarray(rng.normal(size=(B, V, T, 768)), dtype),
        "query_feats": jnp.asarray(rng.normal(size=(B, 25, 768)), dtype),
        "query_valid": jnp.ones((B, 25), dtype=bool),
    }

    step = jax.jit(trainer_lib.make_train_step(cfg, acfg, tcfg, optimizer),
                   donate_argnums=(0, 3))
    t0 = time.time()
    trainable, opt_state, metrics = step(
        trainable, frozen, base, opt_state, batch, jax.random.PRNGKey(3)
    )
    loss0 = float(metrics["loss"])
    print(f"compile+first step: {time.time() - t0:.1f}s loss={loss0:.4f}", flush=True)

    t0 = time.time()
    for i in range(args.steps):
        trainable, opt_state, metrics = step(
            trainable, frozen, base, opt_state, batch, jax.random.PRNGKey(4 + i)
        )
    loss = float(metrics["loss"])  # value-fetch forces completion
    dt = (time.time() - t0) / args.steps
    sup_tok = int(np.asarray(plans["labels"] != -100).sum())
    print(
        f"steady step: {dt*1e3:.0f} ms  ({args.layers}L x {cfg.hidden_size}, "
        f"B={B}, seq {args.seq}, LoRA r={tcfg.lora.r}, int8 frozen base)  "
        f"loss={loss:.4f}  tokens/s={B * args.seq / dt:.0f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
