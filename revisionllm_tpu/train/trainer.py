"""Training runtime: sharded train step + LoRA stage state machine.

TPU-native replacement for the reference training stack (HF Trainer +
DeepSpeed ZeRO-3 + PEFT; reference train/train.py:207-415,
train/vtimellm_trainer.py:66-133): one jitted SPMD train step over a
(data, fsdp, tensor) mesh. Parameter/optimizer sharding comes from
parallel/sharding.py annotations (GSPMD inserts the ZeRO gather/scatter);
gradient checkpointing is `remat=True` on the layer scan; the LoRA stage
machine of train/train.py:299-318 becomes explicit param-tree composition.

Trainable selection mirrors the reference flags:
- tune_mm_mlp_adapter: only the vision adapter gets grads (train.py:351-357)
- freeze_mm_mlp_adapter: adapter excluded (train.py:359-364)
- LoRA: backbone frozen bf16, adapter matrices trained (lora_enable path)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from revisionllm_tpu.config import AdapterConfig, LlamaConfig, LoraConfig, TrainConfig
from revisionllm_tpu.models import lora as lora_mod
from revisionllm_tpu.models import revisionllm

Params = Dict[str, Any]

import contextlib


@contextlib.contextmanager
def _dequant_trace():
    """Force the differentiable dequant+dot route for int8 base weights
    while a loss is being TRACED (QLoRA-style training: frozen int8 base +
    LoRA/adapter grads). The W8A8 activation path contains `round()` whose
    zero derivative would sever gradient flow to earlier layers' LoRA, and
    the Pallas kernels carry no JVP rule — small-M calls (stage-2/stage-3
    hierarchy sequences, M <= pallas_max_m) would reach int8_matmul under
    jax.grad on a TPU backend and fail to differentiate."""
    from revisionllm_tpu.ops import quant

    prev = quant._W8A8_PREFILL
    quant.set_w8a8(False)
    quant.set_exact_trace(True)
    try:
        yield
    finally:
        quant.set_w8a8(prev)
        quant.set_exact_trace(False)


def build_trainable(
    llama_cfg: LlamaConfig,
    train_cfg: TrainConfig,
    vision_params: Params,
    key: jax.Array,
    prior_lora: Optional[Params] = None,
) -> Tuple[Params, Params, Optional[Params]]:
    """Apply the training_stage state machine.

    Returns (trainable, frozen_extra, merged_into_base_lora):
    - stage 1 (+ stage1_load_lora): prior LoRA frozen, adapter trainable
      (reference train.py:299-303)
    - stage 2: fresh LoRA + adapter trainable (train.py:316-318)
    - stage 3: caller merges prior LoRA into the base first (lora.merge),
      then fresh LoRA here (train.py:304,309-315)
    - stage 4: continue training the prior LoRA (train.py:304-307)
    """
    stage = train_cfg.training_stage
    trainable: Params = {}
    frozen: Params = {}

    if train_cfg.tune_mm_mlp_adapter or not train_cfg.freeze_mm_mlp_adapter:
        trainable["vision"] = vision_params
    else:
        frozen["vision"] = vision_params

    if train_cfg.lora is not None and not train_cfg.tune_mm_mlp_adapter:
        if stage == 4 and prior_lora is not None:
            trainable["lora"] = prior_lora
        elif stage == 1 and prior_lora is not None:
            frozen["lora"] = prior_lora
        else:  # stage 2 or 3: fresh adapter
            trainable["lora"] = lora_mod.init_lora(llama_cfg, train_cfg.lora, key)
    elif prior_lora is not None:
        frozen["lora"] = prior_lora

    return trainable, frozen, None


def make_loss_fn(
    llama_cfg: LlamaConfig,
    adapter_cfg: AdapterConfig,
    train_cfg: TrainConfig,
    iteration_step: int = 0,
):
    """`iteration_step` is STATIC (it selects the adapter output mode in
    'alternate' configs — two different program shapes, reference
    vtimellm_arch.py:112-123); build one loss per parity."""
    lora_cfg = train_cfg.lora or LoraConfig()
    scale = lora_mod.lora_scale(lora_cfg)

    def loss_fn(
        trainable: Params,
        frozen: Params,
        base_params: Params,
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
    ) -> jnp.ndarray:
        lora = trainable.get("lora", frozen.get("lora"))
        vision = trainable.get("vision", frozen.get("vision"))
        plan = {
            k: batch[k] for k in ("text_ids", "kind", "src_idx", "labels", "positions", "lengths")
        }
        with _dequant_trace():
            loss = revisionllm.forward_train(
                llama_cfg,
                adapter_cfg,
                base_params,
                vision,
                plan,
                batch["images"],
                query_feats=batch.get("query_feats"),
                query_valid=batch.get("query_valid"),
                memory_tokens=batch.get("memory_tokens"),
                lora=lora,
                lora_scale=scale if lora is not None else 0.0,
                iteration_step=iteration_step,
                deterministic=False,
                rng=rng,
                remat=train_cfg.gradient_checkpointing,
            )
        return loss

    return loss_fn


def make_stream_loss_fn(
    llama_cfg: LlamaConfig,
    adapter_cfg: AdapterConfig,
    train_cfg: TrainConfig,
):
    """Streaming-memory loss (reference vtimellm_trainer.compute_loss
    :67-133): clip2's forward sees [prefix-text, pooled clip1 memory] tokens
    at its <memory> sentinel; stream_loss='double' adds clip1's own loss.

    Batch layout: clip1 fields at top level, clip2 fields prefixed 'c2_',
    plus host-built `visual_memory` [B, M, d] (data/stream.py) and
    `prefix_ids` [B, P]."""
    from revisionllm_tpu.models import llama as llama_mod

    lora_cfg = train_cfg.lora or LoraConfig()
    scale = lora_mod.lora_scale(lora_cfg)
    plan_keys = ("text_ids", "kind", "src_idx", "labels", "positions", "lengths")

    def loss_fn(trainable, frozen, base_params, batch, rng):
        lora = trainable.get("lora", frozen.get("lora"))
        vision = trainable.get("vision", frozen.get("vision"))
        lscale = scale if lora is not None else 0.0

        proj = vision["mm_projector"]
        mem_tokens = batch["visual_memory"] @ proj["w"] + proj["b"]  # [B, M, D]
        prefix_emb = llama_mod.embed_tokens(base_params, batch["prefix_ids"])
        memory_tokens = jnp.concatenate(
            [prefix_emb.astype(mem_tokens.dtype), mem_tokens], axis=1
        )

        plan2 = {k: batch[f"c2_{k}"] for k in plan_keys}
        with _dequant_trace():
            loss = revisionllm.forward_train(
                llama_cfg, adapter_cfg, base_params, vision, plan2,
                batch["c2_images"], memory_tokens=memory_tokens,
                lora=lora, lora_scale=lscale, deterministic=False, rng=rng,
                remat=train_cfg.gradient_checkpointing,
            )
            if train_cfg.stream_loss == "double":
                plan1 = {k: batch[k] for k in plan_keys}
                loss1 = revisionllm.forward_train(
                    llama_cfg, adapter_cfg, base_params, vision, plan1,
                    batch["images"], lora=lora, lora_scale=lscale,
                    deterministic=False, rng=rng,
                    remat=train_cfg.gradient_checkpointing,
                )
                loss = loss + loss1
        return loss

    return loss_fn


def make_train_step(
    llama_cfg: LlamaConfig,
    adapter_cfg: AdapterConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    stream: bool = False,
    iteration_step: int = 0,
):
    """Returns train_step(trainable, frozen, base_params, opt_state, batch, rng)
    -> (trainable, opt_state, metrics). Jit/shard at the call site."""
    if stream:
        loss_fn = make_stream_loss_fn(llama_cfg, adapter_cfg, train_cfg)
    else:
        loss_fn = make_loss_fn(llama_cfg, adapter_cfg, train_cfg, iteration_step)

    def train_step(trainable, frozen, base_params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            trainable, frozen, base_params, batch, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        gnorm = optax.global_norm(grads)
        return trainable, opt_state, {"loss": loss, "grad_norm": gnorm}

    return train_step


def make_sharded_train_step(
    llama_cfg: LlamaConfig,
    adapter_cfg: AdapterConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    stream: bool = False,
    iteration_step: int = 0,
):
    """Jit the train step over a mesh with FSDP/TP param shardings and
    data-parallel batch sharding (the one compiled program that replaces the
    DeepSpeed engine)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from revisionllm_tpu.parallel.mesh import BATCH_AXES

    step = make_train_step(
        llama_cfg, adapter_cfg, train_cfg, optimizer, stream=stream,
        iteration_step=iteration_step,
    )

    batch_sharding = NamedSharding(mesh, P(BATCH_AXES))
    repl = NamedSharding(mesh, P())

    def sharded_step(trainable, frozen, base_params, opt_state, batch, rng):
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree.map(lambda _: batch_sharding, batch)
        )
        return step(trainable, frozen, base_params, opt_state, batch, rng)

    return jax.jit(sharded_step, donate_argnums=(0, 3))
