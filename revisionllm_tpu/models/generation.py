"""Compiled batch decoding with inline confidence capture.

Replaces the reference's copied-in HF `sample()` host loop
(revisionllm/model/vtimellm_llama.py:113-393 — one Python iteration + host
sync per token, with `scores` kept as a list of raw-logit tensors for later
entropy scoring) with a single `lax.scan` program: prefill once, then G decode
steps on-device. Per-step softmax entropy and chosen-token log-probability are
computed inline in fp32 — the information the reference extracts offline via
get_entropy_statistics (funs_get_feature_X.py:120-146) — so confidence
re-ranking needs no [G, B, vocab] logits round-trip to the host.

Decoding is greedy by default: the reference samples at temperature 0.05
(inference.py:49-51), which is argmax for every practical logit gap; a
temperature path is provided for exact stochastic parity.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from revisionllm_tpu.config import LlamaConfig
from revisionllm_tpu.models import llama

from revisionllm_tpu.utils.backend import is_tpu_backend as _is_tpu_backend

_KV8 = None


def set_kv8(enabled: Optional[bool]) -> None:
    """Override the int8 prompt-KV switch (None = re-read the environment)."""
    global _KV8
    _KV8 = enabled


def _kv8_enabled() -> bool:
    """Int8 prompt-KV cache. Default ON for TPU serving (halves the dominant
    HBM read of large-chunk decode; accuracy validated — see BENCH_NOTES
    'Quant promotion'); REVISIONLLM_KV8=0 opts out. Defaults OFF on cpu/gpu
    backends so unit tests exercise exact bf16 decode parity."""
    global _KV8
    if _KV8 is None:
        import os

        env = os.environ.get("REVISIONLLM_KV8")
        if env is not None:
            _KV8 = env == "1"
        else:
            import jax

            _KV8 = _is_tpu_backend()
    return _KV8


_MEGAKERNEL = None


def set_megakernel(enabled: Optional[bool]) -> None:
    global _MEGAKERNEL
    _MEGAKERNEL = enabled


def _megakernel_enabled() -> bool:
    """Fused whole-step decode kernel (ops/decode_step.py). Requires the int8
    serving tree + KV8; REVISIONLLM_MEGAKERNEL=0/1 overrides."""
    global _MEGAKERNEL
    if _MEGAKERNEL is None:
        import os

        # opt-in until the on-chip measurement flips it (BENCH_NOTES)
        _MEGAKERNEL = os.environ.get("REVISIONLLM_MEGAKERNEL", "0") == "1"
    return _MEGAKERNEL


_SERVE = None


def set_serve(enabled: Optional[bool]) -> None:
    global _SERVE
    _SERVE = enabled


def _serve_enabled() -> bool:
    """Serving-layout decode (ops/decode_serve.py): contiguous pre-chunked
    weights + unified KV slab + nb-row batched attention. Requires params
    packed with pack_serving_weights (prefill consumes the pack through
    q8_apply's chunked dispatch). REVISIONLLM_SERVE=0/1 overrides; default
    follows the weight layout (packed params can ONLY decode through the
    serve kernel — the standard [D, N] tree no longer exists in HBM)."""
    global _SERVE
    if _SERVE is None:
        import os

        env = os.environ.get("REVISIONLLM_SERVE")
        _SERVE = None if env is None else env == "1"
    return _SERVE


def generate(
    cfg: LlamaConfig,
    params: Dict[str, Any],
    embeds: jnp.ndarray,
    positions: jnp.ndarray,
    prompt_lens: jnp.ndarray,
    *,
    eos_id: int,
    max_new_tokens: int,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
    shared_prefix_len: int = 0,
    prefix_kv: Optional[Any] = None,
) -> Dict[str, jnp.ndarray]:
    """Decode `max_new_tokens` for a right-padded batch of spliced prompts.

    embeds [B, L, D], positions [B, L], prompt_lens [B]. When all rows share
    their first `shared_prefix_len` embeddings (the engine's window batches
    do), the prefix forward runs once at B=1 (llama.prefill_shared_prefix).
    prefix_kv: P-tuning learned prefix (pk, pv) [L, 1, P, KH, hd]
    (models.prefix) — attended throughout prefill AND decode, positions
    unshifted. Returns dict with tokens/entropy/logprob/valid, each [B, G].
    """
    B, L, _ = embeds.shape
    G = max_new_tokens
    if rng is None:
        rng = jax.random.PRNGKey(0)

    prompt_lens = prompt_lens.astype(jnp.int32)
    from revisionllm_tpu.ops import decode_serve as DSV
    from revisionllm_tpu.ops import decode_step as DS

    lq = params["layers"].get("q_proj")
    packed_layout = isinstance(lq, dict) and "q8c" in lq
    serve_intent = (
        packed_layout
        and prefix_kv is None
        and _serve_enabled() is not False
        and _kv8_enabled()
        and DSV.supports_serve(cfg, params)
    )
    ptuning_len = 0 if prefix_kv is None else int(prefix_kv[0].shape[2])
    if prefix_kv is not None and shared_prefix_len > 1 and B > 1:
        # Only the B>1 shared-prefix prefill branch lacks prefix_kv support;
        # a B==1 caller takes the normal prefill below, which handles it.
        raise ValueError("P-tuning prefix + shared-prefix prefill unsupported")
    if shared_prefix_len > 1 and B > 1:
        first_logits, prompt_kv = llama.prefill_shared_prefix(
            cfg, params, embeds, positions, prefix_len=shared_prefix_len,
            kv_lens=prompt_lens, use_pallas=use_pallas, kv_quant=_kv8_enabled(),
        )
    else:
        # serve path: prefill emits the unified slab layout per layer inside
        # the scan — the split [L,B,T,KH,hd] cache never materializes next
        # to the slab (a repack would transiently need both, ~+5 GB at 7B
        # chunk-64 geometry)
        first_logits, prompt_kv = llama.prefill_kv(
            cfg, params, embeds, positions, kv_lens=prompt_lens,
            use_pallas=use_pallas, kv_quant=_kv8_enabled(),
            kv_slab_slots=G if serve_intent else None,
            prefix_kv=prefix_kv,
        )
    use_serve = serve_intent and ("kv" in prompt_kv or "k_scale" in prompt_kv)
    use_mega = (
        not use_serve
        and ptuning_len == 0
        and _megakernel_enabled()
        and _kv8_enabled()
        and "k_scale" in prompt_kv
        and DS.supports_megakernel(cfg, params)
    )
    if use_serve:
        if "kv" in prompt_kv:
            gen_cache, _s0 = prompt_kv, L
        else:  # shared-prefix prefill returns the split cache; repack
            gen_cache, _s0 = DSV.pack_unified_kv(prompt_kv, G)
    elif use_mega:
        pkv_packed = DS.pack_prompt_kv(prompt_kv)
        gen_cache = DS.init_gen_cache(
            cfg.num_layers, B, cfg.num_kv_heads, cfg.head_dim, G, embeds.dtype
        )
    else:
        gen_cache = {
            "k": jnp.zeros(
                (cfg.num_layers, B, G, cfg.num_kv_heads, cfg.head_dim), embeds.dtype
            ),
            "v": jnp.zeros(
                (cfg.num_layers, B, G, cfg.num_kv_heads, cfg.head_dim), embeds.dtype
            ),
        }

    def select_token(logits, step_rng):
        if temperature > 0.0:
            return jax.random.categorical(step_rng, logits / temperature, axis=-1)
        return jnp.argmax(logits, axis=-1)

    def decode_one(gen_cache, g, tok_embed):
        if not (use_mega or use_serve):
            return llama.decode_step_split(
                cfg, params, prompt_kv, prompt_lens, gen_cache, g,
                tok_embed.astype(embeds.dtype),
                # P-tuning prefix occupies cache[:, :, :P]: widen the valid-
                # position mask without shifting rope positions
                mask_lens=(prompt_lens + ptuning_len) if ptuning_len else None,
            )
        from revisionllm_tpu.ops.norms import rms_norm
        from revisionllm_tpu.ops.rope import rope_angles

        pos = (prompt_lens + g)[:, None]
        rotary_dim = int(cfg.head_dim * cfg.rope_fraction)
        cos, sin = rope_angles(pos, rotary_dim, cfg.rope_theta)
        if use_serve:
            hidden, gen_cache = DSV.decode_step_serve(
                params["layers"], gen_cache, prompt_lens, g,
                tok_embed[:, 0, :].astype(embeds.dtype), cos[:, 0], sin[:, 0],
                s0=_s0, eps=cfg.rms_norm_eps,
                interpret=not _is_tpu_backend(),
            )
        else:
            hidden, gen_cache = DS.decode_step_fused(
                params, pkv_packed, gen_cache, prompt_lens, g,
                tok_embed[:, 0, :].astype(embeds.dtype), cos[:, 0], sin[:, 0],
                eps=cfg.rms_norm_eps,
            )
        h = rms_norm(hidden[:, None, :], params["final_norm"], cfg.rms_norm_eps)
        logits = llama.logits_from_hidden(params, h[:, 0])
        return logits, gen_cache

    def step(carry, g):
        gen_cache, logits, done, rng = carry
        rng, sub = jax.random.split(rng)
        logits32 = logits.astype(jnp.float32)
        probs = jax.nn.softmax(logits32, axis=-1)
        entropy = -jnp.sum(probs * jnp.log(probs + 1e-10), axis=-1)  # [B]
        token = select_token(logits32, sub)  # [B]
        logprob = jnp.log(
            jnp.take_along_axis(probs, token[:, None], axis=-1)[:, 0] + 1e-10
        )
        valid = jnp.logical_not(done)
        token_out = jnp.where(valid, token, eos_id)

        tok_embed = llama.embed_tokens(params, token_out[:, None])
        next_logits, gen_cache = decode_one(gen_cache, g, tok_embed)
        done = jnp.logical_or(done, token_out == eos_id)
        return (gen_cache, next_logits, done, rng), (
            token_out, entropy, logprob, valid,
        )

    init = (gen_cache, first_logits, jnp.zeros((B,), dtype=bool), rng)
    _, (tokens, entropy, logprob, valid) = jax.lax.scan(
        step, init, jnp.arange(G, dtype=jnp.int32)
    )

    return {
        "tokens": jnp.swapaxes(tokens, 0, 1),     # [B, G]
        "entropy": jnp.swapaxes(entropy, 0, 1),   # [B, G] fp32
        "logprob": jnp.swapaxes(logprob, 0, 1),   # [B, G] fp32
        "valid": jnp.swapaxes(valid, 0, 1),       # [B, G] bool
    }


def entropy_stats_from_steps(
    entropy: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """[B, G] per-step entropies + validity -> [B, 4] (max, min, mean, std),
    matching get_entropy_statistics over the generated steps
    (reference funs_get_feature_X.py:130-146)."""
    m = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    neg_inf = jnp.float32(-3.4e38)
    e_max = jnp.max(jnp.where(valid, entropy, neg_inf), axis=1)
    e_min = jnp.min(jnp.where(valid, entropy, -neg_inf), axis=1)
    e_mean = jnp.sum(entropy * m, axis=1) / n
    var = jnp.sum(m * (entropy - e_mean[:, None]) ** 2, axis=1) / jnp.maximum(n - 1.0, 1.0)
    e_std = jnp.where(n > 1, jnp.sqrt(var), 0.0)
    return jnp.stack([e_max, e_min, e_mean, e_std], axis=1)


def generate_stream(
    cfg: LlamaConfig,
    params: Dict[str, Any],
    embeds: jnp.ndarray,
    positions: jnp.ndarray,
    prompt_lens: jnp.ndarray,
    *,
    eos_id: int,
    max_new_tokens: int,
    use_pallas: Optional[bool] = None,
):
    """Token-by-token greedy decoding as a Python generator (yields int token
    ids for row 0). The streaming counterpart of `generate` for interactive
    use — the role of the reference demo's TextStreamer
    (demo_gradio.py:133-141): one host round-trip per token instead of one
    compiled scan, trading throughput for immediate output."""
    B = embeds.shape[0]
    prompt_lens = prompt_lens.astype(jnp.int32)
    logits, prompt_kv = llama.prefill_kv(
        cfg, params, embeds, positions, kv_lens=prompt_lens,
        use_pallas=use_pallas, kv_quant=_kv8_enabled(),
    )
    G = max_new_tokens
    gen_cache = {
        "k": jnp.zeros((cfg.num_layers, B, G, cfg.num_kv_heads, cfg.head_dim), embeds.dtype),
        "v": jnp.zeros((cfg.num_layers, B, G, cfg.num_kv_heads, cfg.head_dim), embeds.dtype),
    }
    import numpy as np

    step_fn = jax.jit(
        lambda p, pkv, gc, s, te: llama.decode_step_split(
            cfg, p, pkv, prompt_lens, gc, s, te
        )
    )
    for g in range(G):
        token = int(np.asarray(jnp.argmax(logits[0])))
        if token == eos_id:
            return
        yield token
        te = llama.embed_tokens(params, jnp.full((B, 1), token, jnp.int32))
        logits, gen_cache = step_fn(
            params, prompt_kv, gen_cache, jnp.int32(g), te.astype(embeds.dtype)
        )
