"""LoRA adapters as parallel parameter pytrees.

PEFT-equivalent of the reference's LoRA setup (train/train.py:281-318: r=64,
alpha=128, all linear layers except lm_head) without module surgery: the
adapter is a pytree mirroring the stacked layer matrices, applied in-line by
the backbone (llama._lora_apply) and merged into the base weights for
inference (the merge_and_unload of reference model/builder.py:53-60).

The 4-stage training state machine (reference train/train.py:299-318):
  stage 1: load prior LoRA frozen, tune the adapter only
  stage 2: fresh LoRA on the base model
  stage 3: merge prior LoRA into base, then add fresh LoRA
  stage 4: continue training the prior LoRA
is realized here by composing `merge` + `init_lora` + trainability masks —
see train/trainer.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from revisionllm_tpu.config import LlamaConfig, LoraConfig
from revisionllm_tpu.models.llama import LAYER_MATRICES, _dims

Params = Dict[str, Any]


def init_lora(
    cfg: LlamaConfig, lora_cfg: LoraConfig, key: jax.Array, dtype=jnp.float32
) -> Params:
    """A ~ N(0, 1/r) (kaiming-ish), B = 0 — standard LoRA init so the adapter
    starts as identity."""
    dims = _dims(cfg)
    L, r = cfg.num_layers, lora_cfg.r
    layers = {}
    keys = jax.random.split(key, len(lora_cfg.target_patterns))
    for i, name in enumerate(lora_cfg.target_patterns):
        if name not in LAYER_MATRICES:
            continue
        din, dout = (dims[d] for d in LAYER_MATRICES[name])
        layers[name] = {
            "a": (jax.random.normal(keys[i], (L, din, r), jnp.float32) * (din ** -0.5)).astype(dtype),
            "b": jnp.zeros((L, r, dout), dtype),
        }
    return {"layers": layers}


def lora_scale(lora_cfg: LoraConfig) -> float:
    return lora_cfg.alpha / lora_cfg.r


def merge(params: Params, lora: Params, lora_cfg: LoraConfig) -> Params:
    """Fold the adapter into the base weights: W <- W + scale * A @ B.

    Parity: PeftModel.merge_and_unload (reference builder.py:55) — after this
    the decode path needs no LoRA matmuls.
    """
    scale = lora_scale(lora_cfg)
    new_layers = dict(params["layers"])
    for name, mats in lora["layers"].items():
        w = params["layers"][name]
        delta = jnp.einsum(
            "ldr,lro->ldo", mats["a"].astype(jnp.float32), mats["b"].astype(jnp.float32)
        ) * scale
        if isinstance(w, dict) and "q8" in w:
            # int8 frozen base (QLoRA-style stage machine): dequantize,
            # fold, requantize per output channel
            from revisionllm_tpu.ops.quant import dequantize_int8, quantize_int8

            merged = dequantize_int8(w["q8"], w["scale"], jnp.float32) + delta
            q, s = quantize_int8(merged)
            new_layers[name] = {"q8": q, "scale": s}
        else:
            new_layers[name] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    out = dict(params)
    out["layers"] = new_layers
    return out


def num_lora_params(lora: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(lora))
