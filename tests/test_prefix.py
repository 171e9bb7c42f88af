"""P-tuning v2 prefix encoder: module shapes, attention math parity,
prefill->decode consistency, generation wiring, checkpoint conversion.

Reference surface: model/chatglm/modeling_chatglm.py PrefixEncoder (:61-89),
get_prompt (:770-783), mask/position handling (:808-814, :1061-1062).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.config import LlamaConfig
from revisionllm_tpu.models import llama
from revisionllm_tpu.models.prefix import init_prefix_params, prefix_kv


@pytest.fixture(scope="module")
def tiny():
    cfg = LlamaConfig(**{**LlamaConfig.tiny().__dict__, "dtype": "float32"})
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    pparams = init_prefix_params(cfg, pre_seq_len=6, rng=jax.random.PRNGKey(1))
    return cfg, params, pparams


class TestPrefixModule:
    def test_shapes(self, tiny):
        cfg, _, pparams = tiny
        kv_size = cfg.num_layers * 2 * cfg.num_kv_heads * cfg.head_dim
        assert pparams["embed"].shape == (6, kv_size)
        pk, pv = prefix_kv(cfg, pparams)
        assert pk.shape == (cfg.num_layers, 1, 6, cfg.num_kv_heads, cfg.head_dim)
        assert pv.shape == pk.shape

    def test_projection_variant(self, tiny):
        cfg, _, _ = tiny
        pp = init_prefix_params(
            cfg, pre_seq_len=4, rng=jax.random.PRNGKey(2), prefix_projection=True
        )
        kv_size = cfg.num_layers * 2 * cfg.num_kv_heads * cfg.head_dim
        assert pp["proj"]["w1"].shape == (kv_size, cfg.hidden_size)
        assert pp["proj"]["w2"].shape == (cfg.hidden_size, kv_size)
        pk, pv = prefix_kv(cfg, pp)
        assert pk.shape == (cfg.num_layers, 1, 4, cfg.num_kv_heads, cfg.head_dim)
        # projection must actually change the values vs raw embedding
        pk_raw, _ = prefix_kv(cfg, {"embed": pp["embed"]})
        assert not np.allclose(np.asarray(pk), np.asarray(pk_raw))

    def test_dropout_train_only(self, tiny):
        cfg, _, pparams = tiny
        pk0, _ = prefix_kv(cfg, pparams)
        pk1, _ = prefix_kv(
            cfg, pparams, dropout_rate=0.5, dropout_rng=jax.random.PRNGKey(3)
        )
        assert not np.allclose(np.asarray(pk0), np.asarray(pk1))
        # no rng -> inference path, no dropout
        pk2, _ = prefix_kv(cfg, pparams, dropout_rate=0.5)
        np.testing.assert_array_equal(np.asarray(pk0), np.asarray(pk2))


class TestPrefixAttentionMath:
    def test_two_piece_merge_equals_concat_softmax(self):
        """The merge the prefix path uses == brute-force softmax over
        [prefix | causal tokens] with an all-visible prefix."""
        from revisionllm_tpu.ops.flash_attention import (
            attention_lse,
            merge_attention_pieces,
        )

        rng = np.random.default_rng(0)
        B, T, H, hd, P = 2, 5, 2, 8, 3
        q = jnp.asarray(rng.normal(size=(B, T, H, hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, T, H, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, T, H, hd)).astype(np.float32))
        pk = jnp.asarray(rng.normal(size=(B, P, H, hd)).astype(np.float32))
        pv = jnp.asarray(rng.normal(size=(B, P, H, hd)).astype(np.float32))

        o1, lse1 = attention_lse(q, pk, pv, causal=False, use_pallas=False)
        o2, lse2 = attention_lse(q, k, v, causal=True, use_pallas=False)
        got = merge_attention_pieces(o1, lse1, o2, lse2)

        kc = jnp.concatenate([pk, k], axis=1)
        vc = jnp.concatenate([pv, v], axis=1)
        s = jnp.einsum("bthd,bshd->bhts", q, kc) / np.sqrt(hd)
        col = np.arange(P + T)[None, :]
        row = np.arange(T)[:, None]
        mask = (col < P) | (col - P <= row)  # prefix visible + causal tokens
        s = jnp.where(jnp.asarray(mask)[None, None], s, -2.0e30)
        p = jax.nn.softmax(s, axis=-1)
        want = jnp.einsum("bhts,bshd->bthd", p, vc)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


class TestPrefixForwardDecode:
    def _embeds(self, cfg, params, T, B=3, seed=7):
        rng = np.random.default_rng(seed)
        ids = jnp.asarray(rng.integers(5, cfg.vocab_size, (B, T)), jnp.int32)
        embeds = llama.embed_tokens(params, ids).astype(jnp.float32)
        positions = jnp.arange(T)[None, :].repeat(B, 0)
        return embeds, positions

    def test_prefix_changes_forward(self, tiny):
        cfg, params, pparams = tiny
        embeds, positions = self._embeds(cfg, params, 10)
        pkv = prefix_kv(cfg, pparams)
        h0 = llama.forward_hidden(cfg, params, embeds, positions)
        h1 = llama.forward_hidden(cfg, params, embeds, positions, prefix_kv=pkv)
        assert h0.shape == h1.shape
        assert not np.allclose(np.asarray(h0), np.asarray(h1))

    def test_prefill_decode_matches_teacher_forcing(self, tiny):
        """decode_step_split over the prefix-folded cache (mask_lens=plen+P,
        rope on plen) must reproduce the full-forward logits at the next
        position — two independent attention implementations."""
        cfg, params, pparams = tiny
        B, T = 3, 9
        pkv = prefix_kv(cfg, pparams)
        P = pkv[0].shape[2]
        embeds, positions = self._embeds(cfg, params, T + 1)
        kv_lens = jnp.full((B,), T, jnp.int32)

        # teacher forcing: full forward over T+1 tokens with prefix
        hidden = llama.forward_hidden(
            cfg, params, embeds, positions, prefix_kv=pkv
        )
        want = llama.logits_from_hidden(params, hidden[:, T])

        # prefill T tokens, then one decode step
        _, cache = llama.prefill_kv(
            cfg, params, embeds[:, :T], positions[:, :T], kv_lens=kv_lens,
            prefix_kv=pkv,
        )
        assert cache["k"].shape[2] == P + T
        gen_cache = {
            "k": jnp.zeros((cfg.num_layers, B, 4, cfg.num_kv_heads, cfg.head_dim),
                           jnp.float32),
            "v": jnp.zeros((cfg.num_layers, B, 4, cfg.num_kv_heads, cfg.head_dim),
                           jnp.float32),
        }
        got, _ = llama.decode_step_split(
            cfg, params, cache, kv_lens, gen_cache, jnp.asarray(0, jnp.int32),
            embeds[:, T : T + 1], mask_lens=kv_lens + P,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    def test_prefill_decode_quantized_cache(self, tiny):
        """Same consistency with the int8 cache (prefix quantized into it)."""
        cfg, params, pparams = tiny
        B, T = 3, 9
        pkv = prefix_kv(cfg, pparams)
        P = pkv[0].shape[2]
        embeds, positions = self._embeds(cfg, params, T + 1, seed=8)
        kv_lens = jnp.full((B,), T, jnp.int32)
        hidden = llama.forward_hidden(cfg, params, embeds, positions, prefix_kv=pkv)
        want = llama.logits_from_hidden(params, hidden[:, T])
        _, cache = llama.prefill_kv(
            cfg, params, embeds[:, :T], positions[:, :T], kv_lens=kv_lens,
            kv_quant=True, prefix_kv=pkv,
        )
        assert cache["k"].dtype == jnp.int8 and cache["k"].shape[2] == P + T
        gen_cache = {
            "k": jnp.zeros((cfg.num_layers, B, 4, cfg.num_kv_heads, cfg.head_dim),
                           jnp.float32),
            "v": jnp.zeros((cfg.num_layers, B, 4, cfg.num_kv_heads, cfg.head_dim),
                           jnp.float32),
        }
        got, _ = llama.decode_step_split(
            cfg, params, cache, kv_lens, gen_cache, jnp.asarray(0, jnp.int32),
            embeds[:, T : T + 1], mask_lens=kv_lens + P,
        )
        # int8 cache noise: relative tolerance only
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0.05, atol=0.05
        )

    def test_generate_with_prefix(self, tiny):
        from revisionllm_tpu.models import generation

        cfg, params, pparams = tiny
        B, T = 2, 8
        embeds, positions = self._embeds(cfg, params, T, B=B, seed=9)
        lens = jnp.full((B,), T, jnp.int32)
        pkv = prefix_kv(cfg, pparams)
        out0 = generation.generate(
            cfg, params, embeds, positions, lens, eos_id=2, max_new_tokens=4
        )
        out1 = generation.generate(
            cfg, params, embeds, positions, lens, eos_id=2, max_new_tokens=4,
            prefix_kv=pkv,
        )
        assert out1["tokens"].shape == (B, 4)
        assert np.isfinite(np.asarray(out1["entropy"])).all()
        # the learned prefix must influence decoding
        assert not np.array_equal(np.asarray(out0["tokens"]),
                                  np.asarray(out1["tokens"])) or not np.allclose(
            np.asarray(out0["entropy"]), np.asarray(out1["entropy"])
        )


class TestPrefixConversion:
    def test_chatglm_state_with_prefix_encoder(self):
        from revisionllm_tpu.models.convert import convert_chatglm

        cfg = LlamaConfig.chatglm2_6b()
        cfg = LlamaConfig(**{
            **cfg.__dict__, "num_layers": 2, "hidden_size": 32, "num_heads": 4,
            "num_kv_heads": 2, "head_dim": 8, "intermediate_size": 48,
            "vocab_size": 64,
        })
        rng = np.random.default_rng(0)
        L, D, ffn = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
        q_out = cfg.num_heads * cfg.head_dim
        kv_out = cfg.num_kv_heads * cfg.head_dim
        state = {
            "transformer.embedding.word_embeddings.weight":
                rng.normal(size=(cfg.vocab_size, D)).astype(np.float32),
            "transformer.encoder.final_layernorm.weight":
                rng.normal(size=(D,)).astype(np.float32),
            "transformer.output_layer.weight":
                rng.normal(size=(cfg.vocab_size, D)).astype(np.float32),
        }
        for i in range(L):
            pre = f"transformer.encoder.layers.{i}"
            state[f"{pre}.self_attention.query_key_value.weight"] = (
                rng.normal(size=(q_out + 2 * kv_out, D)).astype(np.float32))
            state[f"{pre}.self_attention.query_key_value.bias"] = (
                rng.normal(size=(q_out + 2 * kv_out,)).astype(np.float32))
            state[f"{pre}.self_attention.dense.weight"] = (
                rng.normal(size=(D, q_out)).astype(np.float32))
            state[f"{pre}.mlp.dense_h_to_4h.weight"] = (
                rng.normal(size=(2 * ffn, D)).astype(np.float32))
            state[f"{pre}.mlp.dense_4h_to_h.weight"] = (
                rng.normal(size=(D, ffn)).astype(np.float32))
            state[f"{pre}.input_layernorm.weight"] = (
                rng.normal(size=(D,)).astype(np.float32))
            state[f"{pre}.post_attention_layernorm.weight"] = (
                rng.normal(size=(D,)).astype(np.float32))
        kv_size = L * 2 * cfg.num_kv_heads * cfg.head_dim
        state["transformer.prefix_encoder.embedding.weight"] = (
            rng.normal(size=(5, kv_size)).astype(np.float32))
        state["transformer.prefix_encoder.trans.0.weight"] = (
            rng.normal(size=(D, kv_size)).astype(np.float32))
        state["transformer.prefix_encoder.trans.0.bias"] = (
            rng.normal(size=(D,)).astype(np.float32))
        state["transformer.prefix_encoder.trans.2.weight"] = (
            rng.normal(size=(kv_size, D)).astype(np.float32))
        state["transformer.prefix_encoder.trans.2.bias"] = (
            rng.normal(size=(kv_size,)).astype(np.float32))

        out = convert_chatglm(state, cfg)
        assert out["prefix"]["embed"].shape == (5, kv_size)
        assert out["prefix"]["proj"]["w1"].shape == (kv_size, D)
        assert out["prefix"]["proj"]["w2"].shape == (D, kv_size)
        # usable end-to-end: build pk/pv from the converted params
        pk, pv = prefix_kv(cfg, out["prefix"])
        assert pk.shape == (L, 1, 5, cfg.num_kv_heads, cfg.head_dim)

    def test_ptuning_gradients_flow(self, tiny):
        """P-tuning trains ONLY the prefix: grads must reach the table."""
        cfg, params, pparams = tiny
        rng = np.random.default_rng(11)
        ids = jnp.asarray(rng.integers(5, cfg.vocab_size, (2, 6)), jnp.int32)
        embeds = llama.embed_tokens(params, ids).astype(jnp.float32)
        positions = jnp.arange(6)[None, :].repeat(2, 0)

        def loss(pp):
            pkv = prefix_kv(cfg, pp)
            h = llama.forward_hidden(cfg, params, embeds, positions, prefix_kv=pkv)
            return jnp.sum(h ** 2)

        g = jax.grad(loss)(pparams)
        assert np.abs(np.asarray(g["embed"])).max() > 0


class TestPrefixGlmConfig:
    """P-tuning on a GLM-shaped backbone (MQA, qkv bias, half-dim
    interleaved rotary) — the config family whose reference actually
    carries the PrefixEncoder."""

    def _glm_tiny(self):
        return LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=96,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            rope_fraction=0.5, rope_interleaved=True, qkv_bias=True,
            dtype="float32", max_position_embeddings=256,
        )

    def test_teacher_forcing_consistency_glm(self):
        cfg = self._glm_tiny()
        params = llama.init_params(cfg, jax.random.PRNGKey(3), jnp.float32)
        pparams = init_prefix_params(cfg, pre_seq_len=4, rng=jax.random.PRNGKey(4))
        pkv = prefix_kv(cfg, pparams)
        P = pkv[0].shape[2]
        B, T = 2, 7
        rng = np.random.default_rng(10)
        ids = jnp.asarray(rng.integers(5, cfg.vocab_size, (B, T + 1)), jnp.int32)
        embeds = llama.embed_tokens(params, ids).astype(jnp.float32)
        positions = jnp.arange(T + 1)[None, :].repeat(B, 0)
        kv_lens = jnp.full((B,), T, jnp.int32)

        hidden = llama.forward_hidden(cfg, params, embeds, positions, prefix_kv=pkv)
        want = llama.logits_from_hidden(params, hidden[:, T])

        _, cache = llama.prefill_kv(
            cfg, params, embeds[:, :T], positions[:, :T], kv_lens=kv_lens,
            prefix_kv=pkv,
        )
        gen_cache = {
            "k": jnp.zeros((cfg.num_layers, B, 3, cfg.num_kv_heads, cfg.head_dim),
                           jnp.float32),
            "v": jnp.zeros((cfg.num_layers, B, 3, cfg.num_kv_heads, cfg.head_dim),
                           jnp.float32),
        }
        got, _ = llama.decode_step_split(
            cfg, params, cache, kv_lens, gen_cache, jnp.asarray(0, jnp.int32),
            embeds[:, T : T + 1], mask_lens=kv_lens + P,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    def test_converted_prefix_drives_generate(self):
        """prefix params straight from convert_chatglm output shape ->
        generate() runs on the GLM-shaped config."""
        from revisionllm_tpu.models import generation

        cfg = self._glm_tiny()
        params = llama.init_params(cfg, jax.random.PRNGKey(5), jnp.float32)
        kv_size = cfg.num_layers * 2 * cfg.num_kv_heads * cfg.head_dim
        prefix = {"embed": jnp.asarray(
            0.1 * np.random.default_rng(6).normal(size=(3, kv_size)), jnp.float32)}
        pkv = prefix_kv(cfg, prefix)
        B, T = 2, 6
        rng = np.random.default_rng(12)
        ids = jnp.asarray(rng.integers(5, cfg.vocab_size, (B, T)), jnp.int32)
        embeds = llama.embed_tokens(params, ids).astype(jnp.float32)
        positions = jnp.arange(T)[None, :].repeat(B, 0)
        out = generation.generate(
            cfg, params, embeds, positions, jnp.full((B,), T, jnp.int32),
            eos_id=2, max_new_tokens=3, prefix_kv=pkv,
        )
        assert out["tokens"].shape == (B, 3)
        assert np.isfinite(np.asarray(out["entropy"])).all()
