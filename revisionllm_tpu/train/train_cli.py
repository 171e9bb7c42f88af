"""Training entry point.

The counterpart of reference revisionllm/train/train.py:207-415 +
train_mem.py: parse model/data/training flags, assemble base + vision +
LoRA per the training_stage machine, build the dataset/collator, and run the
jitted sharded train loop with periodic orbax checkpoints and auto-resume.

No monkey patching is needed (the Pallas flash kernel is the default
attention path) and no DeepSpeed launcher: one process drives the whole mesh.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from revisionllm_tpu.config import (
    AdapterConfig,
    DataConfig,
    LlamaConfig,
    LoraConfig,
    MeshConfig,
    TrainConfig,
    get_preset,
)
from revisionllm_tpu.models import llama, lora as lora_mod, revisionllm
from revisionllm_tpu.parallel import mesh as mesh_lib, sharding as shard_lib
from revisionllm_tpu.train import checkpoint as ckpt_lib, optimizer as opt_lib, trainer as trainer_lib
from revisionllm_tpu.utils.logging import MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="revisionllm_tpu training")
    p.add_argument("--preset", type=str, default="stage1_dense")
    p.add_argument("--quant_base", action="store_true",
                   help="freeze the backbone as int8 (QLoRA-style): a 7B "
                        "base + LoRA + activations fits one 16 GB chip")
    p.add_argument("--model_base", type=str, default=None,
                   help="HF Vicuna dir; random init if omitted (smoke runs)")
    p.add_argument("--stage2_path", type=str, default=None)
    p.add_argument("--pretrain_mm_mlp_adapter", type=str, default=None)
    p.add_argument("--pretrain_clip_adapter", type=str, default=None)
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--feat_folder", type=str, required=True)
    p.add_argument("--q_feat_dir", type=str, default=None)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--training_stage", type=int, default=None)
    p.add_argument("--num_epochs", type=int, default=None)
    p.add_argument("--per_device_batch_size", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max_steps", type=int, default=0, help="override epoch count")
    p.add_argument("--save_steps", type=int, default=500)
    p.add_argument("--log_steps", type=int, default=10)
    p.add_argument("--tiny_model", action="store_true", help="toy geometry for smoke tests")
    p.add_argument("--lora_r", type=int, default=None,
                   help="LoRA rank override (reference train.py:93 lora_r)")
    p.add_argument("--lora_alpha", type=int, default=None,
                   help="LoRA alpha override (reference train.py:94 lora_alpha)")
    p.add_argument("--memory_type", type=str, default=None,
                   choices=["mean_pool", "gt_mean_pool", "gt_multi", "multi_pool"],
                   help="stream memory pooling override (reference train.py:104)")
    return p.parse_args(argv)


def build_configs(args):
    wl = get_preset(args.preset)
    train_cfg = wl.train
    data_cfg = wl.data
    overrides = {}
    for name in ("training_stage", "num_epochs", "per_device_batch_size",
                 "learning_rate", "memory_type"):
        v = getattr(args, name)
        if v is not None:
            overrides[name] = v
    if args.lora_r is not None and train_cfg.lora is not None:
        overrides["lora"] = LoraConfig(**{
            **train_cfg.lora.__dict__,
            "r": args.lora_r,
            "alpha": args.lora_alpha or 2 * args.lora_r,
        })
    if overrides:
        train_cfg = TrainConfig(**{**train_cfg.__dict__, **overrides})
    data_cfg = DataConfig(**{
        **data_cfg.__dict__,
        "data_path": args.data_path,
        "feat_folder": args.feat_folder,
        "q_feat_dir": args.q_feat_dir,
    })
    if args.tiny_model:
        llama_cfg = LlamaConfig.tiny()
        llama_cfg = LlamaConfig(**{**llama_cfg.__dict__, "dtype": "float32"})
        adapter_cfg = AdapterConfig(**{
            **wl.adapter.__dict__, "d_model": 16, "ffn_dim": 32,
            "hidden_size": llama_cfg.hidden_size, "num_heads": 4,
        })
    else:
        llama_cfg = wl.model
        adapter_cfg = wl.adapter
    return llama_cfg, adapter_cfg, data_cfg, train_cfg


def main(argv=None):
    args = parse_args(argv)
    llama_cfg, adapter_cfg, data_cfg, train_cfg = build_configs(args)
    dtype = jnp.dtype(llama_cfg.dtype)

    mesh = mesh_lib.create_mesh(args.dp, args.fsdp, args.tp)
    logger = MetricLogger(os.path.join(args.output_dir, "train_log.jsonl"))

    # --- model assembly (reference train.py:251-318,348-364) ---
    d_in = adapter_cfg.d_model
    if args.model_base is not None:
        from revisionllm_tpu.models.convert import (
            convert_llama, llama_config_from_hf, load_hf_llama_state,
        )

        # HF config supplies geometry; the preset keeps authority over the
        # compute dtype (tiny synthetic runs train in f32, flagship in bf16)
        llama_cfg = LlamaConfig(**{
            **llama_config_from_hf(args.model_base).__dict__,
            "dtype": str(dtype.name) if hasattr(dtype, "name") else llama_cfg.dtype,
        })
        # the projector must emit the LLM embedding dim of the ACTUAL base,
        # not the preset's flagship geometry
        adapter_cfg = adapter_cfg.with_hidden(llama_cfg.hidden_size)
        base = convert_llama(load_hf_llama_state(args.model_base), llama_cfg, np.float32)
        if args.quant_base:
            from revisionllm_tpu.ops.quant import quantize_llama_params_host

            # host-side quantization BEFORE device transfer (a 13.5 GB bf16
            # 7B would not fit next to activations on a 16 GB chip); the
            # loss traces through the differentiable dequant route
            # (trainer._dequant_trace). Quant scales stay f32.
            base = quantize_llama_params_host(base, quantize_lm_head=False)

            def _dev(tree):
                out = {}
                for k, v in tree.items():
                    if isinstance(v, dict) and "q8" in v:
                        out[k] = {
                            "q8": jnp.asarray(v["q8"]),
                            "scale": jnp.asarray(v["scale"]),
                        }
                    elif isinstance(v, dict):
                        out[k] = _dev(v)
                    else:
                        out[k] = jnp.asarray(v, dtype)
                return out

            base = _dev(base)
        else:
            base = jax.tree.map(lambda x: jnp.asarray(x, dtype), base)
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.model_base, use_fast=True)
    else:
        base = llama.init_params(llama_cfg, jax.random.PRNGKey(args.seed), dtype)
        from revisionllm_tpu.utils.testing import FakeTokenizer

        tokenizer = FakeTokenizer()

    vision = revisionllm.init_vision_params(
        adapter_cfg, jax.random.PRNGKey(args.seed + 1), d_in=d_in, dtype=dtype
    )
    if args.pretrain_clip_adapter or args.pretrain_mm_mlp_adapter:
        from revisionllm_tpu.models.convert import (
            _load_torch_state, convert_clip_adapter, convert_mlp_projector,
        )

        raw = _load_torch_state(args.pretrain_clip_adapter or args.pretrain_mm_mlp_adapter)
        if adapter_cfg.kind == "mlp":
            vision = {"mm_projector": convert_mlp_projector(raw, np.float32)}
        else:
            vision = {"mm_projector": convert_clip_adapter(raw, adapter_cfg, np.float32)}
        vision = jax.tree.map(lambda x: jnp.asarray(x, dtype), vision)

    prior_lora = None
    if args.stage2_path is not None:
        from revisionllm_tpu.models.convert import convert_peft_lora, jnp_tree

        prior_lora, prior_cfg = convert_peft_lora(args.stage2_path, llama_cfg)
        prior_lora = jnp_tree(prior_lora)
        if train_cfg.training_stage == 3:
            base = lora_mod.merge(base, prior_lora, prior_cfg)
            prior_lora = None

    trainable, frozen, _ = trainer_lib.build_trainable(
        llama_cfg, train_cfg, vision, jax.random.PRNGKey(args.seed + 2), prior_lora
    )

    # --- data ---
    from revisionllm_tpu.data.collator import Collator
    from revisionllm_tpu.data.dataset import GroundingDataset

    rng_np = np.random.default_rng(args.seed)
    dataset = GroundingDataset(
        args.data_path, tokenizer, data_cfg, rng=rng_np,
        model_max_length=train_cfg.model_max_length,
    )
    prefix_len = 24
    mem_tokens = 5 if train_cfg.memory_type in ("gt_multi", "multi_pool") else 1
    collator = Collator(
        max_len=train_cfg.model_max_length,
        num_video_tokens=0,
        max_q_len=data_cfg.max_q_l,
        num_memory_tokens=(prefix_len + mem_tokens) if data_cfg.stream else 0,
    )

    global_batch = train_cfg.per_device_batch_size * args.dp * args.fsdp
    steps_per_epoch = max(len(dataset) // global_batch, 1)
    total_steps = args.max_steps or steps_per_epoch * train_cfg.num_epochs

    optimizer = opt_lib.make_optimizer(train_cfg, total_steps)
    opt_state = optimizer.init(trainable)

    base_specs = shard_lib.llama_param_specs(base)
    base = shard_lib.shard_params(mesh, base, base_specs)

    step_fn = trainer_lib.make_sharded_train_step(
        llama_cfg, adapter_cfg, train_cfg, optimizer, mesh, stream=data_cfg.stream
    )

    # --- resume (reference train.py:394-397) ---
    start_step = 0
    latest = ckpt_lib.latest_checkpoint(args.output_dir)
    if latest is not None:
        template = {"trainable": trainable, "opt_state": opt_state, "step": 0}
        restored = ckpt_lib.restore_checkpoint(latest, template)
        trainable = restored["trainable"]
        opt_state = restored["opt_state"]
        start_step = int(restored["step"])
        print(f"resumed from {latest} at step {start_step}", file=sys.stderr)

    # --- loop ---
    # commit arrays to their devices before the first step: jit caches on
    # shardings, and letting the first call commit them costs a second
    # compile (measured 26 s on the 7B geometry)
    trainable = jax.device_put(trainable)
    opt_state = jax.device_put(opt_state)
    rng = jax.random.PRNGKey(args.seed + 3)
    order = rng_np.permutation(len(dataset))
    t_last = time.time()
    with mesh:
        for step in range(start_step, total_steps):
            idx = [
                int(order[(step * global_batch + j) % len(dataset)])
                for j in range(global_batch)
            ]
            batch_np = collator([dataset[i] for i in idx])
            batch_np.pop("iteration_step", None)
            if data_cfg.stream:
                # streaming-memory batch: flatten clip2 + build visual memory
                # (reference vtimellm_trainer.compute_loss :72-121)
                from revisionllm_tpu.data.stream import (
                    build_prefix_ids, build_visual_memory,
                )

                clip2 = batch_np.pop("clip2")
                neg = batch_np.pop("neg")
                clip2.pop("neg", None)
                sef = batch_np.get(
                    "start_end_frame",
                    np.zeros((len(idx), 2), np.int32),
                )
                batch_np["visual_memory"] = build_visual_memory(
                    batch_np["images"], sef, neg, train_cfg.memory_type, rng_np
                )
                batch_np["prefix_ids"] = build_prefix_ids(neg, tokenizer, prefix_len)
                for k, v in clip2.items():
                    if k not in ("start_end_frame", "query_feats", "query_valid"):
                        batch_np[f"c2_{k}"] = v
            batch_np.pop("start_end_frame", None)
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            rng, sub = jax.random.split(rng)
            trainable, opt_state, metrics = step_fn(
                trainable, frozen, base, opt_state, batch, sub
            )
            if (step + 1) % args.log_steps == 0 or step == total_steps - 1:
                dt = time.time() - t_last
                t_last = time.time()
                logger.log(
                    step=step + 1,
                    loss=float(metrics["loss"]),
                    grad_norm=float(metrics["grad_norm"]),
                    sec_per_step=dt / args.log_steps,
                )
            if (step + 1) % args.save_steps == 0 or step == total_steps - 1:
                # async: the ~100 s disk write overlaps subsequent steps
                ckpt_lib.save_checkpoint(
                    args.output_dir,
                    {"trainable": trainable, "opt_state": opt_state, "step": step + 1},
                    step + 1,
                    block=False,
                )
    ckpt_lib.wait_for_checkpoints()

    # --- final reference-format artifacts (train.py:402-412) ---
    ckpt_lib.export_reference_artifacts(
        args.output_dir,
        trainable.get("lora"),
        train_cfg.lora,
        vision={"mm_projector": trainable.get("vision", frozen.get("vision"))["mm_projector"]}
        if (trainable.get("vision") or frozen.get("vision"))
        else None,
    )
    print("training done", file=sys.stderr)


if __name__ == "__main__":
    main()
