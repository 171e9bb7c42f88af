"""LLaMA / Vicuna backbone — functional JAX implementation.

TPU-native rebuild of the backbone the reference wraps
(revisionllm/model/vtimellm_llama.py:23 VTimeLLMLlamaForCausalLM over HF
LlamaForCausalLM): RMSNorm pre-norm, RoPE, MHA/GQA attention, SwiGLU MLP,
tied-free lm_head. Numerics match HF Llama so converted Vicuna-7B-v1.5
checkpoints decode identically.

Design (idiomatic XLA, not a torch translation):
- Parameters are a plain pytree with ALL layers stacked on a leading axis;
  the forward is one `lax.scan` over that axis (fast compile, one fused layer
  program), optionally wrapped in `jax.checkpoint` for gradient rematerialization
  (the ZeRO-3 + gradient-checkpointing configs of
  reference scripts/mad/stage1_dense.sh:35,60).
- Attention runs the Pallas flash kernel (ops/flash_attention.py) on TPU;
  the multimodal splicing feeds pre-built embeddings, so this module consumes
  `embeds` directly rather than token ids.
- Decode keeps a stacked KV cache [L, B, S, KH, hd] updated with
  `dynamic_update_slice` inside the same layer scan; the per-step attention
  masks by cache length (ragged batch support).
- LoRA adapters are a parallel stacked pytree applied in-line
  (x@W + scale * (x@A)@B) — the PEFT-equivalent of reference
  train/train.py:281-318 without module surgery.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from revisionllm_tpu.config import LlamaConfig
from revisionllm_tpu.ops.flash_attention import attention, mha_reference, trainable_attention
from revisionllm_tpu.ops.norms import rms_norm
from revisionllm_tpu.ops.quant import q8_apply, q8_apply_multi
from revisionllm_tpu.ops.rope import apply_rope, apply_rope_interleaved, rope_angles

from revisionllm_tpu.utils.backend import is_tpu_backend as _is_tpu_backend

Params = Dict[str, Any]

LAYER_MATRICES = {
    "q_proj": ("hidden", "q_out"),
    "k_proj": ("hidden", "kv_out"),
    "v_proj": ("hidden", "kv_out"),
    "o_proj": ("q_out", "hidden"),
    "gate_proj": ("hidden", "ffn"),
    "up_proj": ("hidden", "ffn"),
    "down_proj": ("ffn", "hidden"),
}


def _dims(cfg: LlamaConfig) -> Dict[str, int]:
    return {
        "hidden": cfg.hidden_size,
        "q_out": cfg.num_heads * cfg.head_dim,
        "kv_out": cfg.num_kv_heads * cfg.head_dim,
        "ffn": cfg.intermediate_size,
    }


def init_params(cfg: LlamaConfig, key: jax.Array, dtype=None) -> Params:
    """Random init (scaled normal). Real use loads converted HF weights."""
    dtype = dtype or jnp.dtype(cfg.dtype)
    dims = _dims(cfg)
    keys = jax.random.split(key, len(LAYER_MATRICES) + 2)
    L = cfg.num_layers

    layers = {}
    for i, (name, (din, dout)) in enumerate(LAYER_MATRICES.items()):
        scale = (dims[din]) ** -0.5
        layers[name] = (
            jax.random.normal(keys[i], (L, dims[din], dims[dout]), jnp.float32) * scale
        ).astype(dtype)
    layers["attn_norm"] = jnp.ones((L, cfg.hidden_size), dtype)
    layers["mlp_norm"] = jnp.ones((L, cfg.hidden_size), dtype)
    if cfg.qkv_bias:
        layers["q_bias"] = jnp.zeros((L, dims["q_out"]), dtype)
        layers["k_bias"] = jnp.zeros((L, dims["kv_out"]), dtype)
        layers["v_bias"] = jnp.zeros((L, dims["kv_out"]), dtype)

    return {
        "embed": (
            jax.random.normal(keys[-2], (cfg.vocab_size, cfg.hidden_size), jnp.float32)
            * 0.02
        ).astype(dtype),
        "layers": layers,
        "final_norm": jnp.ones((cfg.hidden_size,), dtype),
        "lm_head": (
            jax.random.normal(keys[-1], (cfg.hidden_size, cfg.vocab_size), jnp.float32)
            * cfg.hidden_size ** -0.5
        ).astype(dtype),
    }


def fuse_layer_matrices(params: Params) -> Params:
    """Inference-only layout: concatenate q/k/v -> qkv_proj and gate/up ->
    gateup_proj along the output dim (works for dense arrays and
    {'q8','scale'} dicts). Fewer, larger matmul kernels per decode step.
    Not compatible with in-line LoRA (merge first) or qkv_bias backbones."""
    layers = dict(params["layers"])
    if "qkv_proj" in layers or "q_bias" in layers:
        return params

    def cat(names):
        ws = [layers.pop(n) for n in names]
        if isinstance(ws[0], dict):
            return {
                "q8": jnp.concatenate([w["q8"] for w in ws], axis=-1),
                "scale": jnp.concatenate([w["scale"] for w in ws], axis=-1),
            }
        return jnp.concatenate(ws, axis=-1)

    layers["qkv_proj"] = cat(["q_proj", "k_proj", "v_proj"])
    layers["gateup_proj"] = cat(["gate_proj", "up_proj"])
    out = dict(params)
    out["layers"] = layers
    return out


def embed_tokens(params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    """Token ids -> embeddings. Negative sentinel ids must be resolved by the
    multimodal splicer before this point; they are clamped defensively."""
    ids = jnp.maximum(ids, 0)
    return jnp.take(params["embed"], ids, axis=0)


def _lora_apply(x, w, lora_layer, scale):
    y = q8_apply(x, w)
    if lora_layer is not None:
        # LoRA masters stay fp32 for optimizer precision; cast the delta back
        # so a bf16 residual stream is not silently promoted
        delta = (x @ lora_layer["a"]) @ lora_layer["b"] * scale
        y = y + delta.astype(y.dtype)
    return y


def _rotary_dim(cfg: LlamaConfig) -> int:
    return int(cfg.head_dim * cfg.rope_fraction)


def _rope(cfg: LlamaConfig, x, cos, sin):
    if cfg.rope_interleaved or cfg.rope_fraction < 1.0:
        return apply_rope_interleaved(x, cos, sin, _rotary_dim(cfg))
    return apply_rope(x, cos, sin)


def _attention_block(
    cfg: LlamaConfig,
    lp: Params,
    lora_lp: Optional[Params],
    lora_scale: float,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    kv_lens: Optional[jnp.ndarray],
    use_pallas: Optional[bool],
    trainable: bool = False,
    prefix_pkv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
):
    B, T, D = x.shape
    H, KH, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def proj(name):
        return _lora_apply(x, lp[name], lora_lp.get(name) if lora_lp else None, lora_scale)

    if "qkv_proj" in lp and lora_lp is None:
        qkv = q8_apply(x, lp["qkv_proj"])
        q_out = H * hd
        kv_out = KH * hd
        q = qkv[..., :q_out].reshape(B, T, H, hd)
        k = qkv[..., q_out : q_out + kv_out].reshape(B, T, KH, hd)
        v = qkv[..., q_out + kv_out :].reshape(B, T, KH, hd)
    elif lora_lp is None:
        # one shared activation quantization for q/k/v on the W8A8 path
        # (q8_apply_multi falls back to per-matrix q8_apply otherwise)
        qm, km, vm = q8_apply_multi(
            x, (lp["q_proj"], lp["k_proj"], lp["v_proj"]), use_pallas=use_pallas
        )
        q = qm.reshape(B, T, H, hd)
        k = km.reshape(B, T, KH, hd)
        v = vm.reshape(B, T, KH, hd)
    else:
        q = proj("q_proj").reshape(B, T, H, hd)
        k = proj("k_proj").reshape(B, T, KH, hd)
        v = proj("v_proj").reshape(B, T, KH, hd)
    if cfg.qkv_bias:
        q = q + lp["q_bias"].reshape(H, hd)
        k = k + lp["k_bias"].reshape(KH, hd)
        v = v + lp["v_bias"].reshape(KH, hd)
    q = _rope(cfg, q, cos, sin)
    k = _rope(cfg, k, cos, sin)
    if prefix_pkv is not None:
        # P-tuning prefix: un-roped learned kv [1, P, KH, hd], visible to all
        # query positions (reference modeling_chatglm.py:808-814). Two-piece
        # attention exactly like prefill_shared_prefix; the pure-jnp LSE
        # merge is differentiable, so P-tuning training backprops into the
        # prefix through it.
        from revisionllm_tpu.ops.flash_attention import (
            attention_lse,
            flash_attention_prefixed,
            merge_attention_pieces,
        )

        pk, pv = prefix_pkv
        upr = _is_tpu_backend() if use_pallas is None else use_pallas
        if upr and not trainable:
            o = flash_attention_prefixed(q, k, v, pk, pv, kv_lens=kv_lens)
        else:
            pk_b = jnp.broadcast_to(pk, (B,) + pk.shape[1:])
            pv_b = jnp.broadcast_to(pv, (B,) + pv.shape[1:])
            o1, lse1 = attention_lse(q, pk_b, pv_b, causal=False, use_pallas=False)
            o2, lse2 = attention_lse(
                q, k, v, causal=True, kv_lens=kv_lens, use_pallas=False
            )
            o = merge_attention_pieces(o1, lse1, o2, lse2)
    elif trainable:
        # custom-VJP kernels: the backward also runs blockwise on the MXU
        o = trainable_attention(q, k, v, causal=True, kv_lens=kv_lens, use_pallas=use_pallas)
    else:
        o = attention(q, k, v, causal=True, kv_lens=kv_lens, use_pallas=use_pallas)
    o = o.reshape(B, T, H * hd)
    o = _lora_apply(o, lp["o_proj"], lora_lp.get("o_proj") if lora_lp else None, lora_scale)
    return o, k, v


def _mlp_block(lp, lora_lp, lora_scale, x):
    def proj(name, h):
        return _lora_apply(h, lp[name], lora_lp.get(name) if lora_lp else None, lora_scale)

    if "gateup_proj" in lp and lora_lp is None:
        gu = q8_apply(x, lp["gateup_proj"])
        f = gu.shape[-1] // 2
        return proj("down_proj", jax.nn.silu(gu[..., :f]) * gu[..., f:])
    if lora_lp is None:
        if _fused_mlp_enabled() and isinstance(lp.get("gate_proj"), dict) \
                and "q8" in lp["gate_proj"] and "q8" in lp.get("down_proj", {}):
            # REVISIONLLM_FUSED_MLP=1: SwiGLU tail in one Pallas kernel whose
            # epilogue emits the down_proj input pre-quantized. Measured a
            # TIE with the XLA chain on v5e (BENCH_NOTES round 4 — XLA's
            # quantize chains already hide under matmul stalls); kept
            # opt-in as the A/B harness for other TPU generations.
            from revisionllm_tpu.ops.quant import (
                quantize_activation_rows,
                w8a8_mlp_fused,
                w8a8_prequant_matmul,
            )

            orig = x.shape
            x2 = x.reshape(-1, orig[-1])
            xq, xs = quantize_activation_rows(x2)
            hq, hs = w8a8_mlp_fused(
                xq, xs, lp["gate_proj"]["q8"], lp["gate_proj"]["scale"],
                lp["up_proj"]["q8"], lp["up_proj"]["scale"],
            )
            out = w8a8_prequant_matmul(
                hq, hs, lp["down_proj"]["q8"], lp["down_proj"]["scale"],
                out_dtype=x.dtype,
            )
            return out.reshape(*orig[:-1], out.shape[-1])
        g_lin, up = q8_apply_multi(x, (lp["gate_proj"], lp["up_proj"]))
        return q8_apply(jax.nn.silu(g_lin) * up, lp["down_proj"])
    gate = jax.nn.silu(proj("gate_proj", x))
    up = proj("up_proj", x)
    return proj("down_proj", gate * up)


def forward_hidden(
    cfg: LlamaConfig,
    params: Params,
    embeds: jnp.ndarray,
    positions: jnp.ndarray,
    kv_lens: Optional[jnp.ndarray] = None,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    use_pallas: Optional[bool] = None,
    remat: bool = False,
    return_kv: bool = False,
    trainable: bool = False,
    kv_quant: bool = False,
    kv_slab_slots: Optional[int] = None,
    prefix_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
):
    """Full-sequence forward. embeds [B, T, D], positions [B, T] int32.

    prefix_kv: P-tuning prefix (pk, pv) [L, 1, P, KH, hd] from
    models.prefix.prefix_kv — prepended (un-roped) to every layer's
    attention keys/values; real-token positions are unshifted.

    Returns final hidden [B, T, D]; with return_kv=True also the per-layer
    (k, v) stacks [L, B, T, KH, hd] for cache prefill. kv_quant=True emits
    int8 k/v + per-(position, head) scales INSIDE the layer scan — the bf16
    cache never materializes, which is what lets large window chunks fit
    next to the weights.

    kv_slab_slots (with kv_quant): emit each layer's kv directly in the
    unified serving-slab layout of ops.decode_serve — head-major
    [B, 2, KH, Sp, hd] int8 with Sp = round_up(T + kv_slab_slots, 128)
    (the scan stacks layers into the full [L, ...] slab). The split
    [L, B, T, KH, hd] cache then NEVER materializes, so the slab fits next
    to the 7B weights where split-then-repack would transiently need both.
    """
    cos, sin = rope_angles(positions, _rotary_dim(cfg), cfg.rope_theta)
    T = embeds.shape[1]
    slab_pad = None
    if kv_slab_slots is not None:
        assert kv_quant, "kv_slab_slots requires kv_quant=True"
        slab_pad = ((T + kv_slab_slots + 127) // 128) * 128 - T

    def _quantize_kv(t):
        tf = t.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(tf), axis=-1)
        sc = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        q = jnp.clip(jnp.round(tf / sc[..., None]), -127, 127).astype(jnp.int8)
        return q, sc

    def _slab_entry(kq, ks, vq, vs):
        # [B, T, KH, hd] -> kv [B, 2, KH, Sp, hd], scales [B, 2, KH, Sp]
        def hm(q):
            q = jnp.transpose(q, (0, 2, 1, 3))
            return jnp.pad(q, ((0, 0), (0, 0), (0, slab_pad), (0, 0)))

        def hs(s):
            s = jnp.transpose(s, (0, 2, 1))
            return jnp.pad(s, ((0, 0), (0, 0), (0, slab_pad)))

        kv = jnp.stack([hm(kq), hm(vq)], axis=1)
        sc = jnp.stack([hs(ks), hs(vs)], axis=1).astype(jnp.float32)
        return kv, sc

    def layer(carry, xs):
        x = carry
        lp, lora_lp, ppkv = xs
        h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        attn_out, k, v = _attention_block(
            cfg, lp, lora_lp, lora_scale, h, cos, sin, kv_lens, use_pallas,
            trainable, prefix_pkv=ppkv,
        )
        x = x + attn_out
        h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
        x = x + _mlp_block(lp, lora_lp, lora_scale, h)
        if not return_kv:
            return x, None
        if kv_quant:
            kq, ks = _quantize_kv(k)
            vq, vs = _quantize_kv(v)
            if slab_pad is not None:
                return x, _slab_entry(kq, ks, vq, vs)
            return x, (kq, ks, vq, vs)
        return x, (k, v)

    if remat:
        layer = jax.checkpoint(layer)

    lora_layers = lora["layers"] if lora is not None else None
    # scan xs must share pytree structure per element: build per-case
    # adapters instead of threading Nones through the scanned arrays
    if prefix_kv is None:
        if lora_layers is None:
            hidden, kv = jax.lax.scan(
                lambda c, lp: layer(c, (lp, None, None)), embeds, params["layers"]
            )
        else:
            hidden, kv = jax.lax.scan(
                lambda c, xs: layer(c, (xs[0], xs[1], None)),
                embeds, (params["layers"], lora_layers),
            )
    else:
        pk_all, pv_all = prefix_kv
        if lora_layers is None:
            hidden, kv = jax.lax.scan(
                lambda c, xs: layer(c, (xs[0], None, (xs[1], xs[2]))),
                embeds, (params["layers"], pk_all, pv_all),
            )
        else:
            hidden, kv = jax.lax.scan(
                lambda c, xs: layer(c, (xs[0], xs[1], (xs[2], xs[3]))),
                embeds, (params["layers"], lora_layers, pk_all, pv_all),
            )

    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    if return_kv:
        return hidden, kv
    return hidden


def logits_from_hidden(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """LM head in fp32 (decode-entropy statistics need full-precision logits,
    matching the raw-logit capture of reference vtimellm_llama.py:321)."""
    return q8_apply(hidden, params["lm_head"]).astype(jnp.float32)


# ---------------------------------------------------------------------------
# KV-cache decode
# ---------------------------------------------------------------------------


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=None) -> Params:
    dtype = dtype or jnp.dtype(cfg.dtype)
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def prefill(
    cfg: LlamaConfig,
    params: Params,
    embeds: jnp.ndarray,
    positions: jnp.ndarray,
    cache: Params,
    kv_lens: Optional[jnp.ndarray] = None,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    use_pallas: Optional[bool] = None,
) -> Tuple[jnp.ndarray, Params]:
    """Run the prompt through the model, filling cache[:, :, :T].

    Returns (last-position logits [B, V], cache). With ragged prompts
    (kv_lens), the "last position" per row is kv_lens[i] - 1.
    """
    T = embeds.shape[1]
    hidden, (k, v) = forward_hidden(
        cfg, params, embeds, positions, kv_lens, lora, lora_scale, use_pallas,
        return_kv=True,
    )
    cache = {
        "k": jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype), (0, 0, 0, 0, 0)),
        "v": jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype), (0, 0, 0, 0, 0)),
    }
    if kv_lens is None:
        last = hidden[:, -1]
    else:
        idx = jnp.maximum(kv_lens - 1, 0)
        last = jnp.take_along_axis(hidden, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    return logits_from_hidden(params, last), cache


def decode_step(
    cfg: LlamaConfig,
    params: Params,
    cache: Params,
    cache_lens: jnp.ndarray,
    token_embeds: jnp.ndarray,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
) -> Tuple[jnp.ndarray, Params]:
    """One decode step. token_embeds [B, 1, D]; cache_lens [B] = tokens already
    in cache (the new token lands at position cache_lens[i]).

    Returns (logits [B, V], updated cache). Attention is a small jnp einsum —
    XLA maps it to the MXU; the Pallas kernel targets prefill/training shapes.
    """
    B = token_embeds.shape[0]
    H, KH, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    S = cache["k"].shape[2]
    positions = cache_lens[:, None]  # [B, 1]
    cos, sin = rope_angles(positions, _rotary_dim(cfg), cfg.rope_theta)

    col = jnp.arange(S)[None, :]  # [1, S]
    attn_mask = col <= cache_lens[:, None]  # [B, S]; includes the new token slot

    def layer(x, xs):
        lp, ck, cv = xs
        h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        lora_lp = None  # decode path uses merged weights
        q = q8_apply(h, lp["q_proj"]).reshape(B, 1, H, hd)
        k = q8_apply(h, lp["k_proj"]).reshape(B, 1, KH, hd)
        v = q8_apply(h, lp["v_proj"]).reshape(B, 1, KH, hd)
        if cfg.qkv_bias:
            q = q + lp["q_bias"].reshape(H, hd)
            k = k + lp["k_bias"].reshape(KH, hd)
            v = v + lp["v_bias"].reshape(KH, hd)
        q = _rope(cfg, q, cos, sin)
        k = _rope(cfg, k, cos, sin)

        # scatter new k/v at per-row position cache_lens[i]; a select (not an
        # add) because right-padded rows leave stale prefill k/v in the slot
        write = (col == cache_lens[:, None])[:, :, None, None]  # [B, S, 1, 1]
        ck = jnp.where(write, jnp.broadcast_to(k.astype(ck.dtype), ck.shape), ck)
        cv = jnp.where(write, jnp.broadcast_to(v.astype(cv.dtype), cv.shape), cv)

        # q [B,1,H,hd] x cache [B,S,KH,hd]
        group = H // KH
        qg = q.reshape(B, 1, KH, group, hd)
        s = jnp.einsum(
            "bokgd,bskd->bkgs", qg.astype(jnp.float32), ck.astype(jnp.float32)
        ) * (hd ** -0.5)
        s = jnp.where(attn_mask[:, None, None, :], s, -2.0e30)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bkgs,bskd->bkgd", p, cv.astype(jnp.float32))
        o = o.reshape(B, 1, H * hd).astype(x.dtype)
        x = x + q8_apply(o, lp["o_proj"])
        h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
        x = x + _mlp_block(lp, lora_lp, 0.0, h)
        return x, (ck, cv)

    hidden, (new_k, new_v) = jax.lax.scan(
        layer, token_embeds, (params["layers"], cache["k"], cache["v"])
    )
    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    return logits_from_hidden(params, hidden[:, 0]), {"k": new_k, "v": new_v}


def prefill_kv(
    cfg: LlamaConfig,
    params: Params,
    embeds: jnp.ndarray,
    positions: jnp.ndarray,
    kv_lens: Optional[jnp.ndarray] = None,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    use_pallas: Optional[bool] = None,
    kv_quant: bool = False,
    kv_slab_slots: Optional[int] = None,
    prefix_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, Params]:
    """Prefill without a preallocated cache: returns (last-position logits,
    read-only prompt kv {"k","v"[,"k_scale","v_scale"]} [L, B, T, KH, hd]).
    kv_quant=True yields the int8 cache directly (no bf16 peak).
    kv_slab_slots=G instead returns the unified serving slab
    {"kv", "kvsc"} of ops.decode_serve with G generation slots (s0 = T).

    prefix_kv: P-tuning prefix (pk, pv) [L, 1, P, KH, hd] — attended during
    prefill and FOLDED INTO the returned cache at positions [0, P) (decode
    must then mask with mask_lens = kv_lens + P while keeping rope positions
    on kv_lens; see decode_step_split)."""
    if prefix_kv is not None and kv_slab_slots is not None:
        raise ValueError("P-tuning prefix is not supported with the serve slab")
    hidden, kv_out = forward_hidden(
        cfg, params, embeds, positions, kv_lens, lora, lora_scale, use_pallas,
        return_kv=True, kv_quant=kv_quant, kv_slab_slots=kv_slab_slots,
        prefix_kv=prefix_kv,
    )
    if kv_lens is None:
        last = hidden[:, -1]
    else:
        idx = jnp.maximum(kv_lens - 1, 0)
        last = jnp.take_along_axis(hidden, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    if kv_slab_slots is not None:
        kv, sc = kv_out
        cache = {"kv": kv, "kvsc": sc}
    elif kv_quant:
        kq, ks, vq, vs = kv_out
        cache = {"k": kq, "k_scale": ks, "v": vq, "v_scale": vs}
    else:
        k, v = kv_out
        cache = {"k": k, "v": v}
    if prefix_kv is not None:
        pk_all, pv_all = prefix_kv
        L, _, P = pk_all.shape[:3]
        B = embeds.shape[0]
        pkb = jnp.broadcast_to(pk_all, (L, B) + pk_all.shape[2:]).astype(embeds.dtype)
        pvb = jnp.broadcast_to(pv_all, (L, B) + pv_all.shape[2:]).astype(embeds.dtype)
        if kv_quant:
            pq = quantize_prompt_kv({"k": pkb, "v": pvb})
            cache = {
                name: jnp.concatenate([pq[name], cache[name]], axis=2)
                for name in ("k", "k_scale", "v", "v_scale")
            }
        else:
            cache = {
                "k": jnp.concatenate([pkb, cache["k"]], axis=2),
                "v": jnp.concatenate([pvb, cache["v"]], axis=2),
            }
    return logits_from_hidden(params, last), cache


_FUSED_MLP = None


def _fused_mlp_enabled() -> bool:
    """REVISIONLLM_FUSED_MLP=1: route the W8A8 prefill MLP tail through the
    fused Pallas kernel (ops.quant.w8a8_mlp_fused). Opt-in — measured a tie
    with XLA's chain on v5e (BENCH_NOTES round 4)."""
    global _FUSED_MLP
    if _FUSED_MLP is None:
        import os

        _FUSED_MLP = os.environ.get("REVISIONLLM_FUSED_MLP", "0") == "1"
    return _FUSED_MLP


_ATTN8 = None


def set_attn8(enabled) -> None:
    global _ATTN8
    _ATTN8 = enabled


def _attn8_enabled() -> bool:
    """Int8 MXU attention for the quantized-cache decode step: the KV8
    einsum is VPU-CONVERT-bound (B=64 ablation: 18 ms vs the 6.5 ms KV-read
    floor — the int8->float dequant paces it, not HBM), so q and the softmax
    weights are quantized per head and the contractions run int8 x int8 on
    the MXU with no per-element conversion. Adds ~0.3-0.4% relative noise to
    scores/outputs (same class as KV8 itself).

    MEASURED SLOWER end-to-end (BENCH_NOTES round-2: 2416 vs 2138 ms chunk
    latency at chunk 64) — XLA lowers the batched int8 x int8 einsum worse
    than the convert path it replaces. OPT-IN (REVISIONLLM_ATTN8=1), kept
    with its parity test as a recorded negative result."""
    global _ATTN8
    if _ATTN8 is None:
        import os

        _ATTN8 = os.environ.get("REVISIONLLM_ATTN8", "0") == "1"
    return _ATTN8


def _quantize_rows(x: jnp.ndarray):
    """absmax-int8 over the last axis: returns (int8 values, f32 scale with
    the last axis reduced to 1)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sc = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    return jnp.clip(jnp.round(xf / sc), -127, 127).astype(jnp.int8), sc


def decode_step_split(
    cfg: LlamaConfig,
    params: Params,
    prompt_kv: Params,
    prompt_lens: jnp.ndarray,
    gen_cache: Params,
    step: jnp.ndarray,
    token_embeds: jnp.ndarray,
    mask_lens: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Params]:
    """One decode step with a split KV layout.

    prompt_kv [L, B, S, KH, hd] stays read-only after prefill (no per-step
    rewrite of the big cache — the classic decode_step copied it twice per
    step); new tokens land in the tiny gen_cache [L, B, G, KH, hd] at slot
    `step` (lockstep across rows, so the write is one dynamic_update_slice).
    Softmax over [prompt | generated] uses a two-piece max-merged softmax.
    With a quantized prompt cache, the big contractions optionally run
    int8 x int8 on the MXU (see _attn8_enabled).

    mask_lens: per-row count of VALID cache positions when it differs from
    the rope position base (a P-tuning prefix folded at cache[:, :, :P]
    means mask_lens = prompt_lens + P while rope stays on prompt_lens —
    reference modeling_chatglm.py:1061-1062). Default: prompt_lens.
    """
    B = token_embeds.shape[0]
    H, KH, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    S = prompt_kv["k"].shape[2]
    G = gen_cache["k"].shape[2]
    group = H // KH

    positions = (prompt_lens + step)[:, None]  # [B, 1]
    cos, sin = rope_angles(positions, _rotary_dim(cfg), cfg.rope_theta)

    if mask_lens is None:
        mask_lens = prompt_lens
    prompt_mask = jnp.arange(S)[None, :] < mask_lens[:, None]     # [B, S]
    gen_mask = jnp.arange(G)[None, :] <= step                     # [1->B, G]
    gen_mask = jnp.broadcast_to(gen_mask, (B, G))

    quantized = "k_scale" in prompt_kv

    def layer(x, xs):
        if quantized:
            lp, pk, pv, ksc, vsc, gk, gv = xs
        else:
            lp, pk, pv, gk, gv = xs
        h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        if "qkv_proj" in lp:
            qkv = q8_apply(h, lp["qkv_proj"])
            q_out, kv_out = H * hd, KH * hd
            q = qkv[..., :q_out].reshape(B, 1, H, hd)
            k = qkv[..., q_out : q_out + kv_out].reshape(B, 1, KH, hd)
            v = qkv[..., q_out + kv_out :].reshape(B, 1, KH, hd)
        else:
            q = q8_apply(h, lp["q_proj"]).reshape(B, 1, H, hd)
            k = q8_apply(h, lp["k_proj"]).reshape(B, 1, KH, hd)
            v = q8_apply(h, lp["v_proj"]).reshape(B, 1, KH, hd)
        if cfg.qkv_bias:
            q = q + lp["q_bias"].reshape(H, hd)
            k = k + lp["k_bias"].reshape(KH, hd)
            v = v + lp["v_bias"].reshape(KH, hd)
        q = _rope(cfg, q, cos, sin)
        k = _rope(cfg, k, cos, sin)

        gk = jax.lax.dynamic_update_slice(gk, k.astype(gk.dtype), (0, step, 0, 0))
        gv = jax.lax.dynamic_update_slice(gv, v.astype(gv.dtype), (0, step, 0, 0))

        qg = q.reshape(B, 1, KH, group, hd)
        scale = hd ** -0.5

        attn8 = quantized and _attn8_enabled()
        if attn8:
            # int8 x int8 MXU contraction: no per-element dequant of the
            # cache (the VPU convert was the measured bottleneck)
            q_i8, q_sc = _quantize_rows(qg)  # scale [B, 1, KH, group, 1]
            s1 = jnp.einsum(
                "bokgd,bskd->bkgs", q_i8, pk, preferred_element_type=jnp.int32
            ).astype(jnp.float32)
            s1 = s1 * jnp.transpose(q_sc, (0, 2, 3, 1, 4))[..., 0] * scale
            s1 = s1 * jnp.transpose(ksc, (0, 2, 1))[:, :, None, :]
        else:
            # keep the cache operands in their storage dtype and accumulate
            # in fp32 (preferred_element_type): an explicit .astype(f32)
            # would MATERIALIZE a full fp32 copy of the prompt cache every
            # step — tripling the dominant HBM read of decode
            pk_op = pk if pk.dtype == qg.dtype else pk.astype(qg.dtype)
            s1 = jnp.einsum(
                "bokgd,bskd->bkgs", qg, pk_op, preferred_element_type=jnp.float32
            ) * scale
            if quantized:
                # per-(position, head) dequant scale folded into the scores
                s1 = s1 * jnp.transpose(ksc, (0, 2, 1))[:, :, None, :]
        s1 = jnp.where(prompt_mask[:, None, None, :], s1, -2.0e30)
        s2 = jnp.einsum(
            "bokgd,bskd->bkgs", qg, gk.astype(qg.dtype),
            preferred_element_type=jnp.float32,
        ) * scale
        s2 = jnp.where(gen_mask[:, None, None, :], s2, -2.0e30)

        m = jnp.maximum(
            jnp.max(s1, axis=-1, keepdims=True), jnp.max(s2, axis=-1, keepdims=True)
        )
        p1 = jnp.exp(s1 - m)
        p2 = jnp.exp(s2 - m)
        denom = jnp.sum(p1, axis=-1, keepdims=True) + jnp.sum(p2, axis=-1, keepdims=True)
        if quantized:
            p1v = p1 * jnp.transpose(vsc, (0, 2, 1))[:, :, None, :]
        else:
            p1v = p1
        if attn8:
            p_i8, p_sc = _quantize_rows(p1v)  # [B, KH, group, S] i8
            o1 = jnp.einsum(
                "bkgs,bskd->bkgd", p_i8, pv, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * p_sc
        else:
            pv_op = pv if pv.dtype == qg.dtype else pv.astype(qg.dtype)
            o1 = jnp.einsum(
                "bkgs,bskd->bkgd", p1v.astype(qg.dtype), pv_op,
                preferred_element_type=jnp.float32,
            )
        o = (
            o1
            + jnp.einsum(
                "bkgs,bskd->bkgd", p2.astype(qg.dtype), gv.astype(qg.dtype),
                preferred_element_type=jnp.float32,
            )
        ) / denom
        o = o.reshape(B, 1, H * hd).astype(x.dtype)
        x = x + q8_apply(o, lp["o_proj"])
        h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
        x = x + _mlp_block(lp, None, 0.0, h)
        return x, (gk, gv)

    if quantized:
        xs = (
            params["layers"], prompt_kv["k"], prompt_kv["v"],
            prompt_kv["k_scale"], prompt_kv["v_scale"],
            gen_cache["k"], gen_cache["v"],
        )
    else:
        xs = (
            params["layers"], prompt_kv["k"], prompt_kv["v"],
            gen_cache["k"], gen_cache["v"],
        )
    hidden, (new_gk, new_gv) = jax.lax.scan(layer, token_embeds, xs)
    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    return logits_from_hidden(params, hidden[:, 0]), {"k": new_gk, "v": new_gv}


def quantize_prompt_kv(prompt_kv: Params) -> Params:
    """Int8 prompt KV: per-(layer, batch, position, head) absmax over head_dim.

    Halves the dominant HBM read of large-chunk decode (the prompt cache).
    Opt-in — attention scores pick up ~0.5% relative noise.
    """
    out = {}
    for name in ("k", "v"):
        x = prompt_kv[name].astype(jnp.float32)
        absmax = jnp.max(jnp.abs(x), axis=-1)
        scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        out[name] = jnp.clip(
            jnp.round(x / scale[..., None]), -127, 127
        ).astype(jnp.int8)
        out[f"{name}_scale"] = scale
    return out


def prefill_shared_prefix(
    cfg: LlamaConfig,
    params: Params,
    embeds: jnp.ndarray,
    positions: jnp.ndarray,
    prefix_len: int,
    kv_lens: Optional[jnp.ndarray] = None,
    use_pallas: Optional[bool] = None,
    kv_quant: bool = False,
) -> Tuple[jnp.ndarray, Params]:
    """Prefill where all rows share an identical prompt prefix.

    Every window of one query sees the same system+question tokens before its
    video block (the engine's splice plans are identical across rows), so the
    prefix forward runs once at B=1 and only the per-row remainder pays B-way
    compute — ~P/T of prefill FLOPs saved. The remainder attends to
    [broadcast prefix kv | own causal block] via a logsumexp merge of two
    attention pieces (ops.flash_attention.merge_attention_pieces).

    embeds [B, T, D] (rows share embeds[:, :prefix_len]); returns
    (last-position logits, full prompt kv) exactly like prefill_kv.
    """
    from revisionllm_tpu.ops.flash_attention import (
        attention_lse,
        flash_attention_prefixed,
        merge_attention_pieces,
    )

    if use_pallas is None:
        use_pallas_resolved = _is_tpu_backend()
    else:
        use_pallas_resolved = use_pallas

    B, T, D = embeds.shape
    P = prefix_len
    H, KH, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    # 1) prefix once at B=1
    _, prefix_kv = prefill_kv(
        cfg, params, embeds[:1, :P], positions[:1, :P], use_pallas=use_pallas
    )

    # 2) remainder with two-piece attention per layer
    rest = embeds[:, P:]
    rest_pos = positions[:, P:]
    T2 = T - P
    cos, sin = rope_angles(rest_pos, _rotary_dim(cfg), cfg.rope_theta)
    rest_lens = None
    if kv_lens is not None:
        rest_lens = jnp.maximum(kv_lens.astype(jnp.int32) - P, 0)

    def layer(x, xs):
        lp, pk, pv = xs  # pk/pv: [1, P, KH, hd]
        h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        if "qkv_proj" in lp:
            qkv = q8_apply(h, lp["qkv_proj"])
            q_out, kv_out = H * hd, KH * hd
            q = qkv[..., :q_out].reshape(B, T2, H, hd)
            k = qkv[..., q_out : q_out + kv_out].reshape(B, T2, KH, hd)
            v = qkv[..., q_out + kv_out :].reshape(B, T2, KH, hd)
        else:
            q = q8_apply(h, lp["q_proj"]).reshape(B, T2, H, hd)
            k = q8_apply(h, lp["k_proj"]).reshape(B, T2, KH, hd)
            v = q8_apply(h, lp["v_proj"]).reshape(B, T2, KH, hd)
        if cfg.qkv_bias:
            q = q + lp["q_bias"].reshape(H, hd)
            k = k + lp["k_bias"].reshape(KH, hd)
            v = v + lp["v_bias"].reshape(KH, hd)
        q = _rope(cfg, q, cos, sin)
        k = _rope(cfg, k, cos, sin)

        if use_pallas_resolved:
            # one fused kernel: prefix kv blocks stream through the same
            # online softmax as the causal blocks — no LSE round-trip
            o = flash_attention_prefixed(q, k, v, pk, pv, kv_lens=rest_lens)
        else:
            pk_b = jnp.broadcast_to(pk, (B,) + pk.shape[1:])
            pv_b = jnp.broadcast_to(pv, (B,) + pv.shape[1:])
            o1, lse1 = attention_lse(q, pk_b, pv_b, causal=False, use_pallas=False)
            o2, lse2 = attention_lse(
                q, k, v, causal=True, kv_lens=rest_lens, use_pallas=False
            )
            o = merge_attention_pieces(o1, lse1, o2, lse2)
        o = o.reshape(B, T2, H * hd)
        o = q8_apply(o, lp["o_proj"])
        x = x + o
        h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
        x = x + _mlp_block(lp, None, 0.0, h)
        return x, (k, v)

    hidden, (rk, rv) = jax.lax.scan(
        layer, rest, (params["layers"], prefix_kv["k"], prefix_kv["v"])
    )
    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)

    if kv_lens is None:
        last = hidden[:, -1]
    else:
        idx = jnp.maximum(kv_lens - 1 - P, 0)
        last = jnp.take_along_axis(hidden, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    logits = logits_from_hidden(params, last)

    k_full = jnp.concatenate(
        [jnp.broadcast_to(prefix_kv["k"], (cfg.num_layers, B, P, KH, hd)), rk], axis=2
    )
    v_full = jnp.concatenate(
        [jnp.broadcast_to(prefix_kv["v"], (cfg.num_layers, B, P, KH, hd)), rv], axis=2
    )
    cache = {"k": k_full, "v": v_full}
    if kv_quant:
        cache = quantize_prompt_kv(cache)
    return logits, cache
