"""ClipEncoder vision adapter — query-conditioned window compression.

TPU-native rebuild of the reference adapter
(revisionllm/model/adapter/transformer.py:60-145 `ClipEncoder`): a learned
global CLS token + normalized sine position embedding is prepended to the
window's frame features; an optional text->video cross-attention encoder
("T2V", gated by clip_adapter_text, reference :77-81,248-337) conditions the
frames on the query tokens; a 2-layer post-norm self-attention encoder mixes
them; the output is either the CLS token alone (hierarchy / 'cls' — one token
per window, reference :139-140), the per-frame tokens ('temporal', :141-142),
or an 'alternate' schedule by training iteration parity (:134-138). A final
linear `mm_projector` maps d_model=768 -> LLM hidden 4096 (:86).

Everything is batch-first jnp; the (B·V) window batch of the hierarchy path
(reference vtimellm_arch.py:114-121) becomes a plain leading batch axis, so
one compiled program processes all 100 windows of a video at once.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from revisionllm_tpu.config import AdapterConfig
from revisionllm_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


def sine_positions(
    valid_mask: jnp.ndarray, num_pos_feats: int, temperature: float = 10000.0,
    normalize: bool = True, scale: Optional[float] = None, eps: float = 1e-6,
) -> jnp.ndarray:
    """Normalized 1-D sine embedding (reference transformer.py:19-57).

    valid_mask: [B, L] (1 = valid). Returns [B, L, num_pos_feats] fp32 where
    even output channels are sin, odd are cos, interleaved exactly as the
    reference's stack+flatten.
    """
    if scale is None:
        scale = 2 * math.pi
    x_embed = jnp.cumsum(valid_mask.astype(jnp.float32), axis=1)  # [B, L]
    if normalize:
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    pos = x_embed[:, :, None] / dim_t  # [B, L, F]
    interleaved = jnp.stack([jnp.sin(pos[:, :, 0::2]), jnp.cos(pos[:, :, 1::2])], axis=3)
    return interleaved.reshape(pos.shape[0], pos.shape[1], -1)


def _init_linear(key, din, dout, dtype):
    # xavier-uniform to match the reference's _reset_parameters (:89-92)
    bound = math.sqrt(6.0 / (din + dout))
    w = jax.random.uniform(key, (din, dout), jnp.float32, -bound, bound).astype(dtype)
    return {"w": w, "b": jnp.zeros((dout,), dtype)}


def _init_encoder_layer(key, d, f, dtype):
    ks = jax.random.split(key, 6)
    return {
        "wq": _init_linear(ks[0], d, d, dtype),
        "wk": _init_linear(ks[1], d, d, dtype),
        "wv": _init_linear(ks[2], d, d, dtype),
        "wo": _init_linear(ks[3], d, d, dtype),
        "ffn1": _init_linear(ks[4], d, f, dtype),
        "ffn2": _init_linear(ks[5], f, d, dtype),
        "norm1_w": jnp.ones((d,), dtype), "norm1_b": jnp.zeros((d,), dtype),
        "norm2_w": jnp.ones((d,), dtype), "norm2_b": jnp.zeros((d,), dtype),
    }


def init_adapter_params(cfg: AdapterConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    d = cfg.hidden_size if cfg.cross_attn else cfg.d_model
    ks = jax.random.split(key, 2 * cfg.num_layers + 4)
    params: Params = {
        "global_token": jax.random.normal(ks[0], (d,), jnp.float32).astype(dtype),
        "global_pos": jax.random.normal(ks[1], (d,), jnp.float32).astype(dtype),
        "enc_layers": [
            _init_encoder_layer(ks[2 + i], d, cfg.ffn_dim, dtype)
            for i in range(cfg.num_layers)
        ],
    }
    if cfg.clip_adapter_text:
        params["t2v_layers"] = [
            _init_encoder_layer(ks[2 + cfg.num_layers + i], d, cfg.ffn_dim, dtype)
            for i in range(cfg.num_layers)
        ]
        if cfg.ca_self_attn:
            for i, layer in enumerate(params["t2v_layers"]):
                layer["sa"] = _init_ca_self_attn(
                    cfg, jax.random.fold_in(key, 1000 + i), d, dtype
                )
    if cfg.cross_attn:
        params["text_proj"] = _init_linear(ks[-2], cfg.d_model, cfg.hidden_size, dtype)
    else:
        params["mm_projector"] = _init_linear(ks[-1], d, cfg.hidden_size, dtype)
        if cfg.projector_init == "zero":
            params["mm_projector"]["w"] = jnp.zeros_like(params["mm_projector"]["w"])
    return params


def _init_ca_self_attn(cfg: AdapterConfig, key, d, dtype):
    """CrossLayer self-attention variant parameters (reference
    adapter/cross_attn.py:109-117): performer / linformer / exact MHA, each
    with its own residual LayerNorm (reference norm1)."""
    import math as _math

    from revisionllm_tpu.ops.linear_attention import orthogonal_gaussian

    ks = jax.random.split(key, 5)
    hd = d // cfg.num_heads
    sa = {
        "wq": _init_linear(ks[0], d, d, dtype),
        "wo": _init_linear(ks[3], d, d, dtype),
        "norm_w": jnp.ones((d,), dtype),
        "norm_b": jnp.zeros((d,), dtype),
    }
    if cfg.ca_self_attn == "linformer":
        # one_kv_head + share_kv (the reference call, cross_attn.py:114)
        sa["wkv"] = _init_linear(ks[1], d, hd, dtype)
        sa["e_proj"] = (
            jax.random.normal(ks[2], (cfg.max_video_length, cfg.linformer_k))
            / _math.sqrt(cfg.linformer_k)
        ).astype(dtype)
    else:
        sa["wk"] = _init_linear(ks[1], d, d, dtype)
        sa["wv"] = _init_linear(ks[2], d, d, dtype)
    if cfg.ca_self_attn == "performer":
        m = cfg.performer_nb_features or int(hd * _math.log(hd))
        # FAVOR+ random features: a fixed buffer, not a trainable weight
        # (stop_gradient applied at use; the reference redraws it periodically)
        sa["features"] = orthogonal_gaussian(ks[4], hd, m)
    return sa


def _apply_ca_self_attn(cfg: AdapterConfig, layer, src, video_length,
                        dropout, deterministic, rng):
    """video = norm1(video + dropout(self_attn(video))) on the video block
    (reference cross_attn.py:120-127), CLS + text pass through."""
    from revisionllm_tpu.ops.linear_attention import (
        linformer_self_attention,
        performer_self_attention,
    )

    sa = layer["sa"]
    video = src[:, 1 : video_length + 1]
    if cfg.ca_self_attn == "performer":
        attn = performer_self_attention(
            sa, video, cfg.num_heads, jax.lax.stop_gradient(sa["features"])
        )
    elif cfg.ca_self_attn == "linformer":
        attn = linformer_self_attention(sa, video, cfg.num_heads, sa["e_proj"])
    else:  # 'self-attn': exact MHA (cross_attn.py:116-117)
        attn, rng = _mha(sa, video, video, video, None, cfg.num_heads,
                         dropout, deterministic, rng)
    attn, rng = _dropout(attn, dropout, deterministic, rng)
    video = layer_norm(video + attn, sa["norm_w"], sa["norm_b"])
    out = jnp.concatenate(
        [src[:, :1], video, src[:, video_length + 1 :]], axis=1
    )
    return out, rng


def _linear(p, x):
    return x @ p["w"] + p["b"]


def _mha(layer: Params, q_in, k_in, v_in, key_valid, num_heads: int,
         dropout: float, deterministic: bool, rng):
    """Batch-first multi-head attention with key-padding masking (the only
    mask the reference layers effectively apply; the T2V qmask·kmask quirk at
    transformer.py:287-289 reduces to key padding for valid queries)."""
    B, Lq, d = q_in.shape
    Lk = k_in.shape[1]
    hd = d // num_heads
    q = _linear(layer["wq"], q_in).reshape(B, Lq, num_heads, hd)
    k = _linear(layer["wk"], k_in).reshape(B, Lk, num_heads, hd)
    v = _linear(layer["wv"], v_in).reshape(B, Lk, num_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s / math.sqrt(hd)
    if key_valid is not None:
        s = jnp.where(key_valid[:, None, None, :], s, -2.0e30)
    p = jax.nn.softmax(s, axis=-1)
    if not deterministic and dropout > 0:
        rng, sub = jax.random.split(rng)
        keep = jax.random.bernoulli(sub, 1 - dropout, p.shape)
        p = jnp.where(keep, p / (1 - dropout), 0.0)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
    o = o.reshape(B, Lq, d).astype(q_in.dtype)
    return _linear(layer["wo"], o), rng


def _dropout(x, rate, deterministic, rng):
    if deterministic or rate <= 0:
        return x, rng
    rng, sub = jax.random.split(rng)
    keep = jax.random.bernoulli(sub, 1 - rate, x.shape)
    return jnp.where(keep, x / (1 - rate), 0.0), rng


def _ffn(layer, x, dropout, deterministic, rng):
    h = jax.nn.relu(_linear(layer["ffn1"], x))
    h, rng = _dropout(h, dropout, deterministic, rng)
    return _linear(layer["ffn2"], h), rng


def _encoder_layer_post(layer, src, pos, key_valid, num_heads, dropout,
                        deterministic, rng):
    """Post-norm self-attention layer (reference forward_post :210-223):
    q = k = src + pos, v = src; residual -> LN -> FFN -> residual -> LN."""
    qk = src + pos
    attn, rng = _mha(layer, qk, qk, src, key_valid, num_heads, dropout, deterministic, rng)
    attn, rng = _dropout(attn, dropout, deterministic, rng)
    src = src + attn
    src = layer_norm(src, layer["norm1_w"], layer["norm1_b"])
    ff, rng = _ffn(layer, src, dropout, deterministic, rng)
    ff, rng = _dropout(ff, dropout, deterministic, rng)
    src = src + ff
    src = layer_norm(src, layer["norm2_w"], layer["norm2_b"])
    return src, rng


def _t2v_cross_part(layer, src, pos, video_length, text_valid, num_heads,
                    dropout, deterministic, rng):
    """Cross-attention half of the T2V layer (reference T2V forward_post
    :271-300 up to the residual add): queries = video frames (pos-added),
    keys/values = text tokens. Returns src with the video block replaced by
    the post-cross-attn residual (pre-FFN state); CLS + text pass through."""
    pos_src = src + pos
    q = pos_src[:, 1 : video_length + 1]
    k = pos_src[:, video_length + 1 :]
    v = src[:, video_length + 1 :]
    attn, rng = _mha(layer, q, k, v, text_valid, num_heads, dropout, deterministic, rng)
    attn, rng = _dropout(attn, dropout, deterministic, rng)
    src2 = src[:, 1 : video_length + 1] + attn
    return jnp.concatenate(
        [src[:, :1], src2, src[:, video_length + 1 :]], axis=1
    ), rng


def _t2v_ffn_part(layer, src, video_length, dropout, deterministic, rng):
    """FFN half of the T2V layer (reference T2V forward_post :301-305):
    norm1 -> FFN -> residual -> norm2 on the video block."""
    src2 = src[:, 1 : video_length + 1]
    src3 = layer_norm(src2, layer["norm1_w"], layer["norm1_b"])
    ff, rng = _ffn(layer, src3, dropout, deterministic, rng)
    ff, rng = _dropout(ff, dropout, deterministic, rng)
    src2 = src2 + ff
    src2 = layer_norm(src2, layer["norm2_w"], layer["norm2_b"])
    return jnp.concatenate(
        [src[:, :1], src2, src[:, video_length + 1 :]], axis=1
    ), rng


def _t2v_layer(layer, src, pos, video_length, text_valid, num_heads, dropout,
               deterministic, rng):
    """Full T2V layer = cross-attn part + FFN part (no self-attn insert)."""
    src, rng = _t2v_cross_part(layer, src, pos, video_length, text_valid,
                               num_heads, dropout, deterministic, rng)
    return _t2v_ffn_part(layer, src, video_length, dropout, deterministic, rng)


def clip_encoder_forward(
    cfg: AdapterConfig,
    params: Params,
    video: jnp.ndarray,
    text: Optional[jnp.ndarray] = None,
    text_valid: Optional[jnp.ndarray] = None,
    iteration_step: int = 0,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """video: [B, T, d_in] frame features; text: [B, Lt, d_in] query tokens.

    Returns projected LLM tokens: [B, 1, hidden] in cls/hierarchy mode,
    [B, T, hidden] in temporal mode (reference ClipEncoder.forward :94-145).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    B, T, _ = video.shape
    d = video.shape[-1]

    if cfg.cross_attn and text is not None:
        text = _linear(params["text_proj"], text)

    frame_valid = jnp.ones((B, T), dtype=jnp.float32)
    pos = sine_positions(frame_valid, d).astype(video.dtype)

    glob = jnp.broadcast_to(params["global_token"][None, None, :], (B, 1, d)).astype(video.dtype)
    glob_pos = jnp.broadcast_to(params["global_pos"][None, None, :], (B, 1, d)).astype(video.dtype)
    src = jnp.concatenate([glob, video], axis=1)          # [B, 1+T, d]
    pos_embed = jnp.concatenate([glob_pos, pos], axis=1)  # [B, 1+T, d]
    valid = jnp.ones((B, 1 + T), dtype=bool)

    if cfg.clip_adapter_text and text is not None:
        if text_valid is None:
            text_valid = jnp.ones(text.shape[:2], dtype=bool)
        text_pos = jnp.zeros_like(text)
        src_t2v = jnp.concatenate([src, text], axis=1)
        pos_t2v = jnp.concatenate([pos_embed, text_pos], axis=1)
        video_length = T
        for layer in params["t2v_layers"]:
            # Self-attn insertion points match reference CrossLayer.forward
            # (cross_attn.py:120-130): sa_pos=1 before cross-attn, sa_pos=2
            # between cross-attn and feed-forward — the FFN always runs last.
            # Known deviation: norm placement here follows T2V forward_post
            # (no post-cross-attn LayerNorm before the sa_pos=2 self-attn;
            # the FFN residual is taken from the un-normalized sum), whereas
            # reference CrossLayer applies norm2 to the cross-attn residual
            # first — activations will NOT match reference CrossLayer weights
            # when ca_self_attn is enabled. No reference trained config ships
            # ca_self_attn, so checkpoint parity is unaffected in practice.
            if cfg.ca_self_attn and cfg.sa_pos == 1:
                src_t2v, rng = _apply_ca_self_attn(
                    cfg, layer, src_t2v, video_length, cfg.dropout,
                    deterministic, rng,
                )
            src_t2v, rng = _t2v_cross_part(
                layer, src_t2v, pos_t2v, video_length, text_valid.astype(bool),
                cfg.num_heads, cfg.dropout, deterministic, rng,
            )
            if cfg.ca_self_attn and cfg.sa_pos == 2:
                src_t2v, rng = _apply_ca_self_attn(
                    cfg, layer, src_t2v, video_length, cfg.dropout,
                    deterministic, rng,
                )
            src_t2v, rng = _t2v_ffn_part(
                layer, src_t2v, video_length, cfg.dropout, deterministic, rng,
            )
        src = src_t2v[:, : video_length + 1]

    for layer in params["enc_layers"]:
        src, rng = _encoder_layer_post(
            layer, src, pos_embed, valid, cfg.num_heads, cfg.dropout,
            deterministic, rng,
        )

    def project(x):
        if cfg.cross_attn:
            return x  # Identity projector (reference :86)
        return _linear(params["mm_projector"], x)

    if cfg.feature_mode == "alternate":
        if iteration_step % 2 == 0:
            return project(src[:, :1])
        return project(src[:, 1:])
    if cfg.hierarchy or cfg.feature_mode == "cls":
        return project(src[:, :1])
    if cfg.feature_mode == "temporal":
        return project(src[:, 1:])
    return project(src)
