"""Checkpoint conversion: reference artifacts -> TPU param pytrees.

Replicates the load-side assembly of the reference
(revisionllm/model/builder.py:21-67): HF Vicuna base weights, then
`mm_projector.bin` / `pretrain_clip_adapter` with its key-remap surgery
(vtimellm_arch.py:27-40), then stage-2 / stage-3 PEFT LoRA merge
(builder.py:47-60) — producing the stacked-layer pytrees of models/llama.py,
models/adapter.py and models/lora.py.

Torch is used only as a host-side file reader (torch.load / safetensors);
nothing torch touches the compute path.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional

import numpy as np

from revisionllm_tpu.config import AdapterConfig, LlamaConfig, LoraConfig


def _load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a .bin (torch pickle) or .safetensors file to numpy."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
            for k, v in state.items()}


def load_hf_llama_state(model_dir: str) -> Dict[str, np.ndarray]:
    """Gather the full HF state dict from sharded .safetensors or .bin files."""
    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not files:
        files = sorted(glob.glob(os.path.join(model_dir, "pytorch_model*.bin")))
    if not files:
        raise FileNotFoundError(f"no weight files under {model_dir}")
    state: Dict[str, np.ndarray] = {}
    for f in files:
        state.update(_load_torch_state(f))
    return state


def llama_config_from_hf(model_dir: str) -> LlamaConfig:
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    return LlamaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        head_dim=hf["hidden_size"] // hf["num_attention_heads"],
        rope_theta=hf.get("rope_theta", 10000.0),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
    )


_HF_LAYER_MAP = {
    "q_proj": "self_attn.q_proj.weight",
    "k_proj": "self_attn.k_proj.weight",
    "v_proj": "self_attn.v_proj.weight",
    "o_proj": "self_attn.o_proj.weight",
    "gate_proj": "mlp.gate_proj.weight",
    "up_proj": "mlp.up_proj.weight",
    "down_proj": "mlp.down_proj.weight",
    "attn_norm": "input_layernorm.weight",
    "mlp_norm": "post_attention_layernorm.weight",
}


def convert_llama(
    state: Dict[str, np.ndarray], cfg: LlamaConfig, dtype=np.float32
) -> Dict[str, Any]:
    """HF LlamaForCausalLM state dict -> stacked pytree.

    HF Linear stores [out, in]; ours is [in, out] (x @ W), so matrices are
    transposed. Layer matrices stack on a leading L axis for the scan."""

    def key(name):
        for prefix in ("model.", ""):
            k = prefix + name
            if k in state:
                return state[k]
        raise KeyError(name)

    layers: Dict[str, np.ndarray] = {}
    for ours, theirs in _HF_LAYER_MAP.items():
        mats = []
        for i in range(cfg.num_layers):
            w = key(f"layers.{i}.{theirs}")
            if ours.endswith("_norm"):
                mats.append(w.astype(dtype))
            else:
                mats.append(w.T.astype(dtype))
        layers[ours] = np.stack(mats, axis=0)

    return {
        "embed": key("embed_tokens.weight").astype(dtype),
        "layers": layers,
        "final_norm": key("norm.weight").astype(dtype),
        "lm_head": state["lm_head.weight"].T.astype(dtype),
    }


# ---------------------------------------------------------------------------
# ClipEncoder adapter (mm_projector.bin / non_lora_trainables.bin)
# ---------------------------------------------------------------------------


def _strip_projector_keys(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Key surgery equivalent to get_wc (reference vtimellm_arch.py:30-37):
    extract the sub-dict rooted at 'mm_projector.', tolerating the
    'model.mm_projector.' and 'base_model.model.model.mm_projector.'
    prefixes that appear in non_lora_trainables.bin."""
    out = {}
    for k, v in state.items():
        if "mm_projector." in k:
            out[k.split("mm_projector.", 1)[1]] = v
        elif "cross_attn." in k:
            out[k.split("cross_attn.", 1)[1]] = v
    return out


def _convert_mha_layer(prefix: str, sd: Dict[str, np.ndarray], d: int, dtype):
    inw = sd[f"{prefix}.self_attn.in_proj_weight"]  # [3d, d]
    inb = sd[f"{prefix}.self_attn.in_proj_bias"]    # [3d]
    wq, wk, wv = inw[:d], inw[d : 2 * d], inw[2 * d :]
    bq, bk, bv = inb[:d], inb[d : 2 * d], inb[2 * d :]
    return {
        "wq": {"w": wq.T.astype(dtype), "b": bq.astype(dtype)},
        "wk": {"w": wk.T.astype(dtype), "b": bk.astype(dtype)},
        "wv": {"w": wv.T.astype(dtype), "b": bv.astype(dtype)},
        "wo": {
            "w": sd[f"{prefix}.self_attn.out_proj.weight"].T.astype(dtype),
            "b": sd[f"{prefix}.self_attn.out_proj.bias"].astype(dtype),
        },
        "ffn1": {
            "w": sd[f"{prefix}.linear1.weight"].T.astype(dtype),
            "b": sd[f"{prefix}.linear1.bias"].astype(dtype),
        },
        "ffn2": {
            "w": sd[f"{prefix}.linear2.weight"].T.astype(dtype),
            "b": sd[f"{prefix}.linear2.bias"].astype(dtype),
        },
        "norm1_w": sd[f"{prefix}.norm1.weight"].astype(dtype),
        "norm1_b": sd[f"{prefix}.norm1.bias"].astype(dtype),
        "norm2_w": sd[f"{prefix}.norm2.weight"].astype(dtype),
        "norm2_b": sd[f"{prefix}.norm2.bias"].astype(dtype),
    }


def convert_clip_adapter(
    raw_state: Dict[str, np.ndarray], cfg: AdapterConfig, dtype=np.float32
) -> Dict[str, Any]:
    """Reference ClipEncoder state dict -> models/adapter.py param tree."""
    sd = _strip_projector_keys(raw_state)
    if not sd:
        sd = raw_state
    d = cfg.hidden_size if cfg.cross_attn else cfg.d_model
    params: Dict[str, Any] = {
        "global_token": sd["global_rep_token"].astype(dtype),
        "global_pos": sd["global_rep_pos"].astype(dtype),
        "enc_layers": [
            _convert_mha_layer(f"encoder.layers.{i}", sd, d, dtype)
            for i in range(cfg.num_layers)
        ],
    }
    if cfg.clip_adapter_text and "t2v_encoder.layers.0.self_attn.in_proj_weight" in sd:
        params["t2v_layers"] = [
            _convert_mha_layer(f"t2v_encoder.layers.{i}", sd, d, dtype)
            for i in range(cfg.num_layers)
        ]
    if cfg.cross_attn and "text_mm_projector.weight" in sd:
        params["text_proj"] = {
            "w": sd["text_mm_projector.weight"].T.astype(dtype),
            "b": sd["text_mm_projector.bias"].astype(dtype),
        }
    if "mm_projector.weight" in sd:  # the inner Linear d->hidden
        params["mm_projector"] = {
            "w": sd["mm_projector.weight"].T.astype(dtype),
            "b": sd["mm_projector.bias"].astype(dtype),
        }
    return params


def convert_mlp_projector(raw_state: Dict[str, np.ndarray], dtype=np.float32) -> Dict[str, Any]:
    """Plain Linear mm_projector.bin (the get_w path, vtimellm_arch.py:46-49)."""
    sd = _strip_projector_keys(raw_state)
    if not sd:
        sd = raw_state
    return {
        "w": sd["weight"].T.astype(dtype),
        "b": sd["bias"].astype(dtype),
    }


# ---------------------------------------------------------------------------
# PEFT LoRA adapters
# ---------------------------------------------------------------------------


def convert_peft_lora(
    lora_dir: str, cfg: LlamaConfig, dtype=np.float32
) -> tuple[Dict[str, Any], LoraConfig]:
    """PEFT adapter dir (adapter_model.bin/.safetensors + adapter_config.json)
    -> (lora pytree, LoraConfig). Parity: load_lora (builder.py:9-19)."""
    with open(os.path.join(lora_dir, "adapter_config.json")) as f:
        pcfg = json.load(f)
    lora_cfg = LoraConfig(
        r=pcfg["r"], alpha=pcfg["lora_alpha"], dropout=pcfg.get("lora_dropout", 0.0),
        target_patterns=tuple(pcfg.get("target_modules", [])),
    )
    for name in ("adapter_model.safetensors", "adapter_model.bin"):
        p = os.path.join(lora_dir, name)
        if os.path.isfile(p):
            state = _load_torch_state(p)
            break
    else:
        raise FileNotFoundError(f"no adapter weights in {lora_dir}")

    proj_names = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")
    layers: Dict[str, Dict[str, list]] = {}
    for name in proj_names:
        a_mats, b_mats = [], []
        for i in range(cfg.num_layers):
            a = b = None
            for k, v in state.items():
                if f"layers.{i}." in k and f"{name}.lora_A" in k:
                    a = v
                if f"layers.{i}." in k and f"{name}.lora_B" in k:
                    b = v
            if a is None or b is None:
                break
            a_mats.append(a.T.astype(dtype))  # [in, r]
            b_mats.append(b.T.astype(dtype))  # [r, out]
        if len(a_mats) == cfg.num_layers:
            layers[name] = {"a": np.stack(a_mats), "b": np.stack(b_mats)}
    return {"layers": layers}, lora_cfg


def load_pretrained(
    model_base: str,
    adapter_cfg: AdapterConfig,
    mm_projector_path: Optional[str] = None,
    stage2_lora: Optional[str] = None,
    stage3_lora: Optional[str] = None,
    dtype=np.float32,
):
    """Full checkpoint assembly (parity: load_pretrained_model,
    builder.py:21-67): base -> vision modules -> merge stage2 -> merge stage3.

    Returns (llama_cfg, params, vision_params)."""
    import jax.numpy as jnp

    from revisionllm_tpu.models import lora as lora_mod

    cfg = llama_config_from_hf(model_base)
    state = load_hf_llama_state(model_base)
    params = convert_llama(state, cfg, dtype)

    vision = None
    if mm_projector_path is not None:
        raw = _load_torch_state(mm_projector_path)
        if adapter_cfg.kind == "mlp":
            vision = {"mm_projector": convert_mlp_projector(raw, dtype)}
        else:
            vision = {"mm_projector": convert_clip_adapter(raw, adapter_cfg, dtype)}

    for lora_dir in (stage2_lora, stage3_lora):
        if lora_dir is None:
            continue
        non_lora = os.path.join(lora_dir, "non_lora_trainables.bin")
        # convenience beyond the reference (builder.py merges ONLY LoRA from
        # stage dirs; vision comes from initialize_vision_modules): adopt a
        # stage dir's saved projector as fallback — but never override an
        # explicit mm_projector_path, and only when the saved keys match the
        # requested adapter kind (a stage-1 MLP projector must not be force-
        # parsed as a ClipEncoder when evaluating a stage-3 model)
        if mm_projector_path is None and os.path.isfile(non_lora):
            raw = _load_torch_state(non_lora)
            proj = _strip_projector_keys(raw)
            is_clip_state = any("global_rep_token" in k for k in proj)
            if proj and (adapter_cfg.kind == "mlp") == (not is_clip_state):
                if adapter_cfg.kind == "mlp":
                    vision = {"mm_projector": convert_mlp_projector(raw, dtype)}
                else:
                    vision = {"mm_projector": convert_clip_adapter(raw, adapter_cfg, dtype)}
        lora_tree, lora_cfg = convert_peft_lora(lora_dir, cfg, dtype)
        params = jnp_tree(params)
        params = lora_mod.merge(params, jnp_tree(lora_tree), lora_cfg)

    return cfg, params, vision


def jnp_tree(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, tree)


# ---------------------------------------------------------------------------
# ChatGLM2 backbone
# ---------------------------------------------------------------------------


def convert_chatglm(
    state: Dict[str, np.ndarray], cfg: "LlamaConfig", dtype=np.float32
) -> Dict[str, Any]:
    """ChatGLM2-6B state dict -> backbone pytree (the secondary LLM path,
    reference model/vtimellm_chatglm.py over the vendored
    model/chatglm/modeling_chatglm.py).

    Packed tensors are split: query_key_value [q|k|v] rows; dense_h_to_4h
    [gate|up] rows (SwiGLU chunk order silu(x0)*x1)."""
    L = cfg.num_layers
    q_out = cfg.num_heads * cfg.head_dim
    kv_out = cfg.num_kv_heads * cfg.head_dim
    ffn = cfg.intermediate_size

    def key(name):
        for prefix in ("transformer.", ""):
            k = prefix + name
            if k in state:
                return state[k]
        raise KeyError(name)

    layers: Dict[str, list] = {
        n: [] for n in (
            "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
            "down_proj", "attn_norm", "mlp_norm", "q_bias", "k_bias", "v_bias",
        )
    }
    for i in range(L):
        pre = f"encoder.layers.{i}"
        qkv_w = key(f"{pre}.self_attention.query_key_value.weight")
        qkv_b = key(f"{pre}.self_attention.query_key_value.bias")
        layers["q_proj"].append(qkv_w[:q_out].T.astype(dtype))
        layers["k_proj"].append(qkv_w[q_out : q_out + kv_out].T.astype(dtype))
        layers["v_proj"].append(qkv_w[q_out + kv_out :].T.astype(dtype))
        layers["q_bias"].append(qkv_b[:q_out].astype(dtype))
        layers["k_bias"].append(qkv_b[q_out : q_out + kv_out].astype(dtype))
        layers["v_bias"].append(qkv_b[q_out + kv_out :].astype(dtype))
        layers["o_proj"].append(key(f"{pre}.self_attention.dense.weight").T.astype(dtype))
        h4 = key(f"{pre}.mlp.dense_h_to_4h.weight")
        layers["gate_proj"].append(h4[:ffn].T.astype(dtype))
        layers["up_proj"].append(h4[ffn:].T.astype(dtype))
        layers["down_proj"].append(key(f"{pre}.mlp.dense_4h_to_h.weight").T.astype(dtype))
        layers["attn_norm"].append(key(f"{pre}.input_layernorm.weight").astype(dtype))
        layers["mlp_norm"].append(key(f"{pre}.post_attention_layernorm.weight").astype(dtype))

    out = {
        "embed": key("embedding.word_embeddings.weight").astype(dtype),
        "layers": {n: np.stack(v) for n, v in layers.items()},
        "final_norm": key("encoder.final_layernorm.weight").astype(dtype),
        "lm_head": key("output_layer.weight").T.astype(dtype),
    }
    # P-tuning checkpoints (config pre_seq_len set): the learned prefix table
    # + optional 2-layer projection (modeling_chatglm.py PrefixEncoder :61-89)
    for pe in ("prefix_encoder.", "transformer.prefix_encoder."):
        if pe + "embedding.weight" in state:
            prefix: Dict[str, Any] = {
                "embed": state[pe + "embedding.weight"].astype(dtype)
            }
            if pe + "trans.0.weight" in state:  # torch Linear: [out, in] -> T
                prefix["proj"] = {
                    "w1": state[pe + "trans.0.weight"].T.astype(dtype),
                    "b1": state[pe + "trans.0.bias"].astype(dtype),
                    "w2": state[pe + "trans.2.weight"].T.astype(dtype),
                    "b2": state[pe + "trans.2.bias"].astype(dtype),
                }
            out["prefix"] = prefix
            break
    return out
