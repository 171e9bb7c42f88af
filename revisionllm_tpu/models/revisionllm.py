"""ReVisionLLM model assembly: adapter routing + splicing + LM.

The TPU-native counterpart of the reference meta-model
(revisionllm/model/vtimellm_arch.py VTimeLLMMetaModel /
VTimeLLMMetaForCausalLM): owns the vision adapter(s), encodes window features
into LLM tokens, splices them into the embedding stream, and runs the Llama
backbone for training loss or batched generation.

Adapter routing parity (vtimellm_arch.py:102-147):
- `mlp` projector: plain Linear over frame features (arch.py:125, the
  non-clip_adapter path).
- `clip_encoder` + hierarchy: (b, v, t, d) windows flattened to (b·v, t, d),
  query features broadcast per window, encoder emits 1 CLS token per window
  -> (b, v, D) (arch.py:114-121).
- `clip_encoder` temporal: per-frame tokens for a single window batch
  (arch.py:123).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from revisionllm_tpu.config import AdapterConfig, LlamaConfig
from revisionllm_tpu.constants import IGNORE_INDEX
from revisionllm_tpu.models import generation, llama
from revisionllm_tpu.models.adapter import clip_encoder_forward, init_adapter_params
from revisionllm_tpu.models.multimodal import splice_embeds

Params = Dict[str, Any]


def init_mlp_projector(key: jax.Array, d_in: int, hidden: int, dtype=jnp.float32) -> Params:
    scale = d_in ** -0.5
    return {
        "w": (jax.random.normal(key, (d_in, hidden), jnp.float32) * scale).astype(dtype),
        "b": jnp.zeros((hidden,), dtype),
    }


def init_vision_params(
    adapter_cfg: AdapterConfig, key: jax.Array, d_in: int = 768, dtype=jnp.float32
) -> Params:
    """Vision module init (parity: initialize_vision_modules,
    reference vtimellm_arch.py:12-73)."""
    if adapter_cfg.kind == "mlp":
        return {"mm_projector": init_mlp_projector(key, d_in, adapter_cfg.hidden_size, dtype)}
    out = {"mm_projector": init_adapter_params(adapter_cfg, key, dtype)}
    if adapter_cfg.feature_mode == "alternate":
        # LayerNorm applied to the adapter output in alternate mode
        # (reference vtimellm_arch.py:72-73, 146-147)
        out["alternate_ln"] = {
            "w": jnp.ones((adapter_cfg.hidden_size,), dtype),
            "b": jnp.zeros((adapter_cfg.hidden_size,), dtype),
        }
    return out


def encode_video(
    adapter_cfg: AdapterConfig,
    vision_params: Params,
    images: jnp.ndarray,
    query_feats: Optional[jnp.ndarray] = None,
    query_valid: Optional[jnp.ndarray] = None,
    iteration_step: int = 0,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Frame features -> LLM token block.

    images: [B, T, d] (single window per sample) or [B, V, T, d] (hierarchy).
    Returns [B, Nv, hidden] where Nv = V (hierarchy), T (temporal) or T (mlp).
    """
    proj = vision_params["mm_projector"]
    if adapter_cfg.kind == "mlp":
        return images @ proj["w"] + proj["b"]

    def _post(toks):
        if adapter_cfg.feature_mode == "alternate" and "alternate_ln" in vision_params:
            from revisionllm_tpu.ops.norms import layer_norm

            ln = vision_params["alternate_ln"]
            return layer_norm(toks, ln["w"], ln["b"])
        return toks

    if images.ndim == 4:  # hierarchy: one CLS token per window
        B, V, T, d = images.shape
        flat = images.reshape(B * V, T, d)
        if query_feats is not None:
            qf = jnp.repeat(query_feats, V, axis=0)  # [B*V, Lq, d]
            qv = jnp.repeat(query_valid, V, axis=0) if query_valid is not None else None
        else:
            qf, qv = None, None
        toks = clip_encoder_forward(
            adapter_cfg, proj, flat, qf, qv, iteration_step, deterministic, rng
        )  # [B*V, 1, hidden]
        return _post(toks.reshape(B, V, -1))

    return _post(
        clip_encoder_forward(
            adapter_cfg, proj, images, query_feats, query_valid, iteration_step,
            deterministic, rng,
        )
    )


def assemble_inputs(
    params: Params,
    plan: Dict[str, jnp.ndarray],
    video_tokens: jnp.ndarray,
    memory_tokens: Optional[jnp.ndarray] = None,
    dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Splice plan + video tokens -> (embeds, positions, lengths)."""
    text_embeds = llama.embed_tokens(params, plan["text_ids"])
    if dtype is not None:
        text_embeds = text_embeds.astype(dtype)
    embeds = splice_embeds(
        text_embeds, plan["kind"], plan["src_idx"], video_tokens, memory_tokens
    )
    return embeds, plan["positions"], plan["lengths"]


def lm_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = IGNORE_INDEX
) -> jnp.ndarray:
    """Shifted causal cross-entropy, mean over supervised positions (the HF
    CausalLM loss the reference trains with)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    mask = shift_labels != ignore_index
    safe_labels = jnp.maximum(shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_lp = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    total = jnp.sum(jnp.where(mask, -token_lp, 0.0))
    count = jnp.maximum(jnp.sum(mask), 1)
    return total / count


def forward_train(
    cfg: LlamaConfig,
    adapter_cfg: AdapterConfig,
    params: Params,
    vision_params: Params,
    plan: Dict[str, jnp.ndarray],
    images: jnp.ndarray,
    query_feats: Optional[jnp.ndarray] = None,
    query_valid: Optional[jnp.ndarray] = None,
    memory_tokens: Optional[jnp.ndarray] = None,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    iteration_step: int = 0,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
    remat: bool = False,
) -> jnp.ndarray:
    """One training forward -> scalar LM loss.

    Mirrors VTimeLLMLlamaForCausalLM.forward (reference vtimellm_llama.py:38-90):
    encode video, splice, run backbone, causal LM loss over the labels the
    splice plan carries.
    """
    video_tokens = encode_video(
        adapter_cfg, vision_params, images, query_feats, query_valid,
        iteration_step, deterministic, rng,
    )
    embeds, positions, lengths = assemble_inputs(
        params, plan, video_tokens, memory_tokens, dtype=jnp.dtype(cfg.dtype)
    )
    hidden = llama.forward_hidden(
        cfg, params, embeds, positions, kv_lens=lengths, lora=lora,
        lora_scale=lora_scale, use_pallas=use_pallas, remat=remat,
        trainable=True,
    )
    logits = llama.logits_from_hidden(params, hidden)
    return lm_loss(logits, plan["labels"])


def generate_grounding(
    cfg: LlamaConfig,
    adapter_cfg: AdapterConfig,
    params: Params,
    vision_params: Params,
    plan: Dict[str, jnp.ndarray],
    images: jnp.ndarray,
    query_feats: Optional[jnp.ndarray] = None,
    query_valid: Optional[jnp.ndarray] = None,
    memory_tokens: Optional[jnp.ndarray] = None,
    *,
    eos_id: int,
    max_new_tokens: int = 32,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
    shared_prefix_len: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Full inference call: encode windows -> splice -> batched decode.

    The per-call equivalent of reference inference.py:28-75 (model.generate
    with output_scores), returning tokens + inline confidence signals.
    `shared_prefix_len` marks identical leading tokens across rows (window
    batches share their prompt prefix) for single-pass prefix prefill.
    """
    video_tokens = encode_video(
        adapter_cfg, vision_params, images, query_feats, query_valid
    )
    embeds, positions, lengths = assemble_inputs(
        params, plan, video_tokens, memory_tokens, dtype=jnp.dtype(cfg.dtype)
    )
    out = generation.generate(
        cfg, params, embeds, positions, lengths,
        eos_id=eos_id, max_new_tokens=max_new_tokens, temperature=temperature,
        rng=rng, use_pallas=use_pallas, shared_prefix_len=shared_prefix_len,
    )
    out["entropy_stats"] = generation.entropy_stats_from_steps(
        out["entropy"], out["valid"]
    )
    return out
