"""CLIP ViT-L/14 image + text encoders in JAX.

TPU-native replacement for the vendored OpenAI CLIP the reference uses for
feature extraction (reference revisionllm/data/feature_extraction/clip/model.py,
~772 LoC torch). Architecture: pre-norm ViT with class token and absolute
position embeddings, QuickGELU MLPs, final LayerNorm + linear projection;
causal text transformer pooled at the EOT token. Matches the reference's one
modification — `encode_text` returns BOTH per-token features and the pooled
EOT feature (reference clip/model.py:339-352) — which is what the
query-feature stores hold (token_features + cls_features).

Weights convert from the HF `openai/clip-vit-large-patch14` layout
(convert_hf_clip below); image preprocessing (resize/center-crop/normalize)
stays on host in data/feature_extraction.py.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from revisionllm_tpu.ops.norms import layer_norm


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def _attn(layer: Dict[str, Any], x: jnp.ndarray, num_heads: int, causal: bool) -> jnp.ndarray:
    B, L, d = x.shape
    hd = d // num_heads
    q = (x @ layer["wq"]["w"] + layer["wq"]["b"]).reshape(B, L, num_heads, hd)
    k = (x @ layer["wk"]["w"] + layer["wk"]["b"]).reshape(B, L, num_heads, hd)
    v = (x @ layer["wv"]["w"] + layer["wv"]["b"]).reshape(B, L, num_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s / math.sqrt(hd)
    if causal:
        row = jnp.arange(L)[:, None]
        col = jnp.arange(L)[None, :]
        s = jnp.where((row >= col)[None, None], s, -2.0e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
    o = o.reshape(B, L, d).astype(x.dtype)
    return o @ layer["wo"]["w"] + layer["wo"]["b"]


def _block(layer: Dict[str, Any], x: jnp.ndarray, num_heads: int, causal: bool) -> jnp.ndarray:
    h = layer_norm(x, layer["ln1_w"], layer["ln1_b"])
    x = x + _attn(layer, h, num_heads, causal)
    h = layer_norm(x, layer["ln2_w"], layer["ln2_b"])
    h = quick_gelu(h @ layer["fc1"]["w"] + layer["fc1"]["b"])
    x = x + (h @ layer["fc2"]["w"] + layer["fc2"]["b"])
    return x


def encode_image(
    params: Dict[str, Any],
    pixels: jnp.ndarray,
    patch_size: int | None = None,
    num_heads: int | None = None,
) -> jnp.ndarray:
    """pixels: [B, 3, H, W] normalized. Returns [B, proj_dim] image features.

    Patch embedding is a strided conv = reshape + matmul (MXU-friendly).
    `patch_size`/`num_heads` must be passed explicitly when `params` is a jit
    argument (they are static ints, not weights)."""
    v = params["visual"]
    B = pixels.shape[0]
    P = patch_size if patch_size is not None else v["patch_size"]
    heads = num_heads if num_heads is not None else v["num_heads"]
    # [B, 3, H, W] -> [B, gh, gw, 3*P*P] -> matmul
    x = pixels.reshape(B, 3, pixels.shape[2] // P, P, pixels.shape[3] // P, P)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, -1, 3 * P * P)
    x = x @ v["patch_embed"]  # [B, L, d]
    cls = jnp.broadcast_to(v["class_embed"][None, None], (B, 1, x.shape[-1]))
    x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
    x = x + v["pos_embed"][None]
    x = layer_norm(x, v["ln_pre_w"], v["ln_pre_b"])
    for layer in v["blocks"]:
        x = _block(layer, x, heads, causal=False)
    x = layer_norm(x[:, 0], v["ln_post_w"], v["ln_post_b"])
    return x @ v["proj"]


def encode_text(
    params: Dict[str, Any],
    token_ids: jnp.ndarray,
    num_heads: int | None = None,
) -> Dict[str, jnp.ndarray]:
    """token_ids: [B, 77]. Returns {last_hidden_state: [B, 77, proj],
    pooler_output: [B, proj]} — the reference's modified return
    (clip/model.py:339-352): per-token features projected, pooled at argmax
    (EOT) position."""
    t = params["text"]
    heads = num_heads if num_heads is not None else t["num_heads"]
    x = jnp.take(t["token_embed"], token_ids, axis=0)
    x = x + t["pos_embed"][None, : x.shape[1]]
    for layer in t["blocks"]:
        x = _block(layer, x, heads, causal=True)
    x = layer_norm(x, t["ln_final_w"], t["ln_final_b"])
    projected = x @ t["proj"]
    eot = jnp.argmax(token_ids, axis=-1)
    pooled = jnp.take_along_axis(projected, eot[:, None, None], axis=1)[:, 0]
    return {"last_hidden_state": projected, "pooler_output": pooled}


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------


def _lin(state, prefix, dtype):
    return {
        "w": state[f"{prefix}.weight"].T.astype(dtype),
        "b": state[f"{prefix}.bias"].astype(dtype),
    }


def _hf_block(state, prefix, dtype):
    return {
        "wq": _lin(state, f"{prefix}.self_attn.q_proj", dtype),
        "wk": _lin(state, f"{prefix}.self_attn.k_proj", dtype),
        "wv": _lin(state, f"{prefix}.self_attn.v_proj", dtype),
        "wo": _lin(state, f"{prefix}.self_attn.out_proj", dtype),
        "fc1": _lin(state, f"{prefix}.mlp.fc1", dtype),
        "fc2": _lin(state, f"{prefix}.mlp.fc2", dtype),
        "ln1_w": state[f"{prefix}.layer_norm1.weight"].astype(dtype),
        "ln1_b": state[f"{prefix}.layer_norm1.bias"].astype(dtype),
        "ln2_w": state[f"{prefix}.layer_norm2.weight"].astype(dtype),
        "ln2_b": state[f"{prefix}.layer_norm2.bias"].astype(dtype),
    }


def convert_hf_clip(state: Dict[str, np.ndarray], dtype=np.float32) -> Dict[str, Any]:
    """HF CLIPModel state dict -> our param tree (ViT-L/14 or any size)."""
    n_v = max(
        int(k.split(".")[3]) for k in state if k.startswith("vision_model.encoder.layers.")
    ) + 1
    n_t = max(
        int(k.split(".")[3]) for k in state if k.startswith("text_model.encoder.layers.")
    ) + 1
    patch_w = state["vision_model.embeddings.patch_embedding.weight"]  # [d, 3, P, P]
    d_v = patch_w.shape[0]
    P = patch_w.shape[-1]
    d_t = state["text_model.embeddings.token_embedding.weight"].shape[1]
    visual = {
        "patch_size": P,
        "num_heads": d_v // 64,
        # conv [d, 3, P, P] -> matmul [(3*P*P), d] matching our reshape order
        "patch_embed": patch_w.reshape(d_v, -1).T.astype(dtype),
        "class_embed": state["vision_model.embeddings.class_embedding"].astype(dtype),
        "pos_embed": state["vision_model.embeddings.position_embedding.weight"].astype(dtype),
        "ln_pre_w": state["vision_model.pre_layrnorm.weight"].astype(dtype),
        "ln_pre_b": state["vision_model.pre_layrnorm.bias"].astype(dtype),
        "ln_post_w": state["vision_model.post_layernorm.weight"].astype(dtype),
        "ln_post_b": state["vision_model.post_layernorm.bias"].astype(dtype),
        "proj": state["visual_projection.weight"].T.astype(dtype),
        "blocks": [
            _hf_block(state, f"vision_model.encoder.layers.{i}", dtype) for i in range(n_v)
        ],
    }
    text = {
        "num_heads": d_t // 64,
        "token_embed": state["text_model.embeddings.token_embedding.weight"].astype(dtype),
        "pos_embed": state["text_model.embeddings.position_embedding.weight"].astype(dtype),
        "ln_final_w": state["text_model.final_layer_norm.weight"].astype(dtype),
        "ln_final_b": state["text_model.final_layer_norm.bias"].astype(dtype),
        "proj": state["text_projection.weight"].T.astype(dtype),
        "blocks": [
            _hf_block(state, f"text_model.encoder.layers.{i}", dtype) for i in range(n_t)
        ],
    }
    return {"visual": visual, "text": text}
