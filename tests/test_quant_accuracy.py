"""Statistical sanity for the opt-in quantized paths: on a tiny model with
random weights, W8A8 and int8-KV decode must agree with the fp paths on the
overwhelming majority of greedy decisions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.config import LlamaConfig
from revisionllm_tpu.models import llama
from revisionllm_tpu.ops.quant import quantize_int8, w8a8_matmul


class TestW8A8Argmax:
    def test_argmax_agreement(self):
        """Per-row argmax of x@W survives double int8 quantization for the
        vast majority of rows (random gaussian regime)."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32))
        q, s = quantize_int8(w)
        a_fp = np.argmax(np.asarray(x @ w), axis=-1)
        a_q = np.argmax(np.asarray(w8a8_matmul(x, q, s)), axis=-1)
        agreement = (a_fp == a_q).mean()
        assert agreement > 0.95, agreement


class TestKv8Argmax:
    @pytest.mark.slow
    def test_greedy_agreement(self):
        cfg = LlamaConfig(**{**LlamaConfig.tiny().__dict__, "dtype": "float32"})
        params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        rng = np.random.default_rng(1)
        agree, total = 0, 0
        for trial in range(8):
            B, P = 4, 12
            ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, P)))
            pos = jnp.broadcast_to(jnp.arange(P), (B, P))
            lens = jnp.full((B,), P, jnp.int32)
            e = llama.embed_tokens(params, ids)
            _, kv = llama.prefill_kv(cfg, params, e, pos, kv_lens=lens)
            gen = {
                "k": jnp.zeros((cfg.num_layers, B, 2, cfg.num_kv_heads, cfg.head_dim)),
                "v": jnp.zeros((cfg.num_layers, B, 2, cfg.num_kv_heads, cfg.head_dim)),
            }
            tok = llama.embed_tokens(params, ids[:, :1])
            lg_fp, _ = llama.decode_step_split(cfg, params, kv, lens, gen, jnp.int32(0), tok)
            lg_q8, _ = llama.decode_step_split(
                cfg, params, llama.quantize_prompt_kv(kv), lens, gen, jnp.int32(0), tok
            )
            agree += int((np.argmax(np.asarray(lg_fp), -1) == np.argmax(np.asarray(lg_q8), -1)).sum())
            total += B
        assert agree / total > 0.85, (agree, total)


class TestPromotedDefaults:
    """Round-2 promotion (VERDICT item 3): W8A8 + KV8 default ON for TPU
    backends, OFF on cpu/gpu (exact test parity), overridable via
    set_w8a8/set_kv8 and env vars."""

    def test_backend_conditional_defaults(self, monkeypatch):
        from revisionllm_tpu.models import generation
        from revisionllm_tpu.ops import quant

        monkeypatch.delenv("REVISIONLLM_W8A8", raising=False)
        monkeypatch.delenv("REVISIONLLM_KV8", raising=False)
        quant.set_w8a8(None)
        generation.set_kv8(None)
        try:
            # conftest pins JAX_PLATFORMS=cpu
            assert quant._w8a8_enabled() is False
            assert generation._kv8_enabled() is False
        finally:
            quant.set_w8a8(None)
            generation.set_kv8(None)

    def test_env_and_setter_override(self, monkeypatch):
        from revisionllm_tpu.models import generation
        from revisionllm_tpu.ops import quant

        monkeypatch.setenv("REVISIONLLM_W8A8", "1")
        monkeypatch.setenv("REVISIONLLM_KV8", "1")
        quant.set_w8a8(None)
        generation.set_kv8(None)
        try:
            assert quant._w8a8_enabled() is True
            assert generation._kv8_enabled() is True
            quant.set_w8a8(False)
            generation.set_kv8(False)
            assert quant._w8a8_enabled() is False
            assert generation._kv8_enabled() is False
        finally:
            quant.set_w8a8(None)
            generation.set_kv8(None)

    def test_forced_w8a8_engages_on_cpu(self):
        """set_w8a8(True) must route large-M q8_apply through the int8
        activation path even off-TPU (the validation harness relies on it)."""
        from revisionllm_tpu.ops import quant

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(512, 64)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
        q, s = quantize_int8(w)
        wd = {"q8": q, "scale": s}
        exact = np.asarray(quant.q8_apply(x, wd))
        quant.set_w8a8(True)
        try:
            forced = np.asarray(quant.q8_apply(x, wd))
        finally:
            quant.set_w8a8(None)
        # engaged => different rounding than dequant path, but close
        assert not np.array_equal(exact, forced)
        np.testing.assert_allclose(exact, forced, atol=0.2, rtol=0.1)


class TestAttn8:
    """Int8 MXU attention (q + softmax-weight quantization over the int8
    cache): decode parity within quantization noise, same greedy tokens."""

    def _decode(self, cfg, params, prompt_kv, prompt_lens, te, steps, attn8):
        from revisionllm_tpu.models import llama as L

        L.set_attn8(attn8)
        try:
            B = te.shape[0]
            gen = {
                "k": jnp.zeros((cfg.num_layers, B, steps, cfg.num_kv_heads,
                                cfg.head_dim), jnp.float32),
                "v": jnp.zeros((cfg.num_layers, B, steps, cfg.num_kv_heads,
                                cfg.head_dim), jnp.float32),
            }
            outs = []
            cur = te
            for s in range(steps):
                logits, gen = L.decode_step_split(
                    cfg, params, prompt_kv, prompt_lens, gen, jnp.int32(s), cur
                )
                outs.append(np.asarray(logits))
                nxt = jnp.argmax(logits, -1)
                cur = L.embed_tokens(params, nxt[:, None]).astype(jnp.float32)
            return outs
        finally:
            L.set_attn8(None)

    @pytest.mark.slow
    def test_logit_and_token_parity(self):
        from revisionllm_tpu.config import LlamaConfig
        from revisionllm_tpu.models import llama as L
        from revisionllm_tpu.ops.quant import quantize_llama_params

        cfg = LlamaConfig(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=4, head_dim=32,
            max_position_embeddings=256, dtype="float32",
        )
        params = quantize_llama_params(
            L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        )
        B, S = 4, 24
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(5, cfg.vocab_size, (B, S)))
        embeds = L.embed_tokens(params, ids).astype(jnp.float32)
        pos = jnp.arange(S)[None, :].repeat(B, 0)
        lens = jnp.asarray([S, S - 2, S - 5, S - 1], jnp.int32)
        _, pkv = L.prefill_kv(cfg, params, embeds, pos, kv_lens=lens, kv_quant=True)
        te = jnp.asarray(rng.normal(size=(B, 1, cfg.hidden_size)), jnp.float32)

        ref = self._decode(cfg, params, pkv, lens, te, 3, attn8=False)
        q8 = self._decode(cfg, params, pkv, lens, te, 3, attn8=True)
        agree = np.mean([
            (r.argmax(-1) == q.argmax(-1)).mean() for r, q in zip(ref, q8)
        ])
        assert agree >= 0.9, agree
        rel = np.max([
            np.max(np.abs(r - q)) / max(np.max(np.abs(r)), 1e-6)
            for r, q in zip(ref, q8)
        ])
        assert rel < 0.05, rel
