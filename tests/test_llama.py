"""Backbone tests: shapes, causality, and prefill/decode parity with the
full-sequence forward (the property that makes KV-cache decode trustworthy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.config import LlamaConfig
from revisionllm_tpu.models import llama


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig.tiny()
    cfg = cfg.__class__(**{**cfg.__dict__, "dtype": "float32"})
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    return cfg, params


class TestForward:
    def test_shapes(self, setup):
        cfg, params = setup
        B, T = 2, 16
        ids = jnp.arange(B * T).reshape(B, T) % cfg.vocab_size
        embeds = llama.embed_tokens(params, ids)
        pos = jnp.broadcast_to(jnp.arange(T), (B, T))
        hidden = llama.forward_hidden(cfg, params, embeds, pos)
        assert hidden.shape == (B, T, cfg.hidden_size)
        logits = llama.logits_from_hidden(params, hidden)
        assert logits.shape == (B, T, cfg.vocab_size)
        assert logits.dtype == jnp.float32

    def test_causality(self, setup):
        """Changing a future token must not affect past logits."""
        cfg, params = setup
        T = 12
        ids1 = jnp.arange(T)[None] % cfg.vocab_size
        ids2 = ids1.at[0, -1].set((ids1[0, -1] + 7) % cfg.vocab_size)
        pos = jnp.arange(T)[None]
        h1 = llama.forward_hidden(cfg, params, llama.embed_tokens(params, ids1), pos)
        h2 = llama.forward_hidden(cfg, params, llama.embed_tokens(params, ids2), pos)
        np.testing.assert_allclose(
            np.asarray(h1[0, :-1]), np.asarray(h2[0, :-1]), rtol=1e-5, atol=1e-5
        )
        assert not np.allclose(np.asarray(h1[0, -1]), np.asarray(h2[0, -1]))

    def test_remat_matches(self, setup):
        cfg, params = setup
        ids = jnp.arange(8)[None] % cfg.vocab_size
        pos = jnp.arange(8)[None]
        e = llama.embed_tokens(params, ids)
        h1 = llama.forward_hidden(cfg, params, e, pos, remat=False)
        h2 = llama.forward_hidden(cfg, params, e, pos, remat=True)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-6)

    def test_sentinel_ids_clamped(self, setup):
        cfg, params = setup
        ids = jnp.array([[-200, 5, -300, 7]])
        e = llama.embed_tokens(params, ids)
        np.testing.assert_allclose(np.asarray(e[0, 0]), np.asarray(params["embed"][0]))


class TestDecodeParity:
    def test_prefill_then_decode_matches_full_forward(self, setup):
        cfg, params = setup
        B, P, G = 2, 10, 4  # prompt len, generate len
        total = P + G
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, total)))
        pos = jnp.broadcast_to(jnp.arange(total), (B, total))

        # full teacher-forced forward
        full_hidden = llama.forward_hidden(
            cfg, params, llama.embed_tokens(params, ids), pos
        )
        full_logits = llama.logits_from_hidden(params, full_hidden)

        # prefill prompt, then feed the same tokens step by step
        cache = llama.init_kv_cache(cfg, B, total, jnp.float32)
        prompt_embeds = llama.embed_tokens(params, ids[:, :P])
        logits, cache = llama.prefill(cfg, params, prompt_embeds, pos[:, :P], cache)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full_logits[:, P - 1]), rtol=1e-4, atol=1e-4
        )
        cache_lens = jnp.full((B,), P, dtype=jnp.int32)
        for t in range(P, total):
            tok = llama.embed_tokens(params, ids[:, t : t + 1])
            logits, cache = llama.decode_step(cfg, params, cache, cache_lens, tok)
            np.testing.assert_allclose(
                np.asarray(logits), np.asarray(full_logits[:, t]), rtol=1e-4, atol=1e-4
            )
            cache_lens = cache_lens + 1

    def test_ragged_prefill_last_logits(self, setup):
        """Rows with different prompt lengths: prefill must pick each row's own
        final position."""
        cfg, params = setup
        B, T = 2, 8
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, T)))
        pos = jnp.broadcast_to(jnp.arange(T), (B, T))
        kv_lens = jnp.array([5, 8], dtype=jnp.int32)

        cache = llama.init_kv_cache(cfg, B, T + 4, jnp.float32)
        logits, _ = llama.prefill(
            cfg, params, llama.embed_tokens(params, ids), pos, cache, kv_lens=kv_lens
        )
        # row 0's last valid position is 4: compare against a dense forward of
        # just the first 5 tokens
        h = llama.forward_hidden(
            cfg, params, llama.embed_tokens(params, ids[:1, :5]), pos[:1, :5]
        )
        want = llama.logits_from_hidden(params, h)[0, -1]
        np.testing.assert_allclose(np.asarray(logits[0]), np.asarray(want), rtol=1e-4, atol=1e-4)


class TestRaggedDecode:
    def test_ragged_batch_decode_matches_per_row(self, setup):
        """Right-padded rows must decode exactly as if run alone — catches the
        stale-prefill-kv-slot bug (decode writes must replace, not add)."""
        cfg, params = setup
        rng = np.random.default_rng(5)
        lens = [4, 8]
        T = max(lens)
        ids = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(2, T)))
        pos = jnp.broadcast_to(jnp.arange(T), (2, T))
        kv_lens = jnp.asarray(lens, jnp.int32)

        from revisionllm_tpu.models import generation

        out = generation.generate(
            cfg, params, llama.embed_tokens(params, ids), pos, kv_lens,
            eos_id=2, max_new_tokens=5,
        )

        # row 0 alone, unpadded
        ids0 = ids[:1, : lens[0]]
        out0 = generation.generate(
            cfg, params, llama.embed_tokens(params, ids0),
            pos[:1, : lens[0]], jnp.asarray([lens[0]], jnp.int32),
            eos_id=2, max_new_tokens=5,
        )
        np.testing.assert_array_equal(
            np.asarray(out["tokens"][0]), np.asarray(out0["tokens"][0])
        )


class TestKv8Decode:
    def test_quantized_prompt_kv_close(self, setup):
        """Int8 prompt KV decode stays close to the bf16 path (greedy tokens
        may differ at ties; compare the first-step logits numerically)."""
        cfg, params = setup
        from revisionllm_tpu.models import llama as L

        B, P = 2, 10
        rng = np.random.default_rng(9)
        ids = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(B, P)))
        pos = jnp.broadcast_to(jnp.arange(P), (B, P))
        lens = jnp.full((B,), P, jnp.int32)
        _, prompt_kv = L.prefill_kv(cfg, params, L.embed_tokens(params, ids), pos, kv_lens=lens)

        gen = {
            "k": jnp.zeros((cfg.num_layers, B, 4, cfg.num_kv_heads, cfg.head_dim)),
            "v": jnp.zeros((cfg.num_layers, B, 4, cfg.num_kv_heads, cfg.head_dim)),
        }
        tok = L.embed_tokens(params, ids[:, :1])
        logits_fp, _ = L.decode_step_split(cfg, params, prompt_kv, lens, gen, jnp.int32(0), tok)
        qkv = L.quantize_prompt_kv(prompt_kv)
        logits_q8, _ = L.decode_step_split(cfg, params, qkv, lens, gen, jnp.int32(0), tok)
        err = np.abs(np.asarray(logits_fp) - np.asarray(logits_q8))
        scale = np.abs(np.asarray(logits_fp)).mean() + 1e-6
        assert err.mean() / scale < 0.05
        assert (np.argmax(np.asarray(logits_fp), -1) == np.argmax(np.asarray(logits_q8), -1)).mean() >= 0.5

    def test_in_scan_kv_quant_matches_posthoc(self, setup):
        cfg, params = setup
        from revisionllm_tpu.models import llama as L

        ids = jnp.asarray(np.random.default_rng(11).integers(3, cfg.vocab_size, (2, 8)))
        pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
        lens = jnp.full((2,), 8, jnp.int32)
        _, kv_fp = L.prefill_kv(cfg, params, L.embed_tokens(params, ids), pos, kv_lens=lens)
        _, kv_q = L.prefill_kv(
            cfg, params, L.embed_tokens(params, ids), pos, kv_lens=lens, kv_quant=True
        )
        posthoc = L.quantize_prompt_kv(kv_fp)
        np.testing.assert_array_equal(np.asarray(kv_q["k"]), np.asarray(posthoc["k"]))
        np.testing.assert_allclose(
            np.asarray(kv_q["k_scale"]), np.asarray(posthoc["k_scale"]), rtol=1e-6
        )


class TestFusedLayout:
    def test_fused_matches_unfused(self, setup):
        cfg, params = setup
        from revisionllm_tpu.models.llama import fuse_layer_matrices

        fused = fuse_layer_matrices(params)
        assert "qkv_proj" in fused["layers"] and "q_proj" not in fused["layers"]
        ids = jnp.arange(10)[None] % cfg.vocab_size
        pos = jnp.arange(10)[None]
        e = llama.embed_tokens(params, ids)
        h0 = llama.forward_hidden(cfg, params, e, pos)
        h1 = llama.forward_hidden(cfg, fused, e, pos)
        # fused dot tiles differently: float-associativity noise only
        np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), rtol=1e-4, atol=1e-5)

    def test_fused_decode_parity(self, setup):
        cfg, params = setup
        from revisionllm_tpu.models import generation
        from revisionllm_tpu.models.llama import fuse_layer_matrices

        fused = fuse_layer_matrices(params)
        ids = jnp.asarray(np.random.default_rng(3).integers(3, cfg.vocab_size, (1, 6)))
        e = llama.embed_tokens(params, ids)
        pos = jnp.arange(6)[None]
        lens = jnp.array([6], jnp.int32)
        o0 = generation.generate(cfg, params, e, pos, lens, eos_id=2, max_new_tokens=4)
        o1 = generation.generate(cfg, fused, e, pos, lens, eos_id=2, max_new_tokens=4)
        np.testing.assert_array_equal(np.asarray(o0["tokens"]), np.asarray(o1["tokens"]))

    def test_fused_quantized(self, setup):
        cfg, params = setup
        from revisionllm_tpu.models.llama import fuse_layer_matrices
        from revisionllm_tpu.ops.quant import quantize_llama_params

        qf = fuse_layer_matrices(quantize_llama_params(params))
        assert qf["layers"]["qkv_proj"]["q8"].dtype == jnp.int8
        ids = jnp.arange(8)[None] % cfg.vocab_size
        e = llama.embed_tokens(params, ids)
        pos = jnp.arange(8)[None]
        h = llama.forward_hidden(cfg, qf, e, pos)
        assert np.isfinite(np.asarray(h)).all()


class TestSharedPrefixPrefill:
    def test_matches_regular_prefill(self, setup):
        """Shared-prefix prefill must produce the same logits and prompt kv as
        the regular prefill when rows genuinely share a prefix."""
        cfg, params = setup
        from revisionllm_tpu.models import llama as L

        B, P, T = 3, 5, 12
        rng = np.random.default_rng(7)
        prefix = rng.integers(3, cfg.vocab_size, (1, P))
        rest = rng.integers(3, cfg.vocab_size, (B, T - P))
        ids = jnp.asarray(np.concatenate([np.repeat(prefix, B, 0), rest], axis=1))
        pos = jnp.broadcast_to(jnp.arange(T), (B, T))
        lens = jnp.full((B,), T, jnp.int32)
        e = L.embed_tokens(params, ids)

        logits_ref, kv_ref = L.prefill_kv(cfg, params, e, pos, kv_lens=lens)
        logits_sp, kv_sp = L.prefill_shared_prefix(
            cfg, params, e, pos, prefix_len=P, kv_lens=lens
        )
        np.testing.assert_allclose(
            np.asarray(logits_sp), np.asarray(logits_ref), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(kv_sp["k"]), np.asarray(kv_ref["k"]), rtol=2e-4, atol=2e-4
        )

    def test_ragged_rows(self, setup):
        cfg, params = setup
        from revisionllm_tpu.models import llama as L

        B, P, T = 2, 4, 10
        rng = np.random.default_rng(8)
        prefix = rng.integers(3, cfg.vocab_size, (1, P))
        rest = rng.integers(3, cfg.vocab_size, (B, T - P))
        ids = jnp.asarray(np.concatenate([np.repeat(prefix, B, 0), rest], axis=1))
        pos = jnp.broadcast_to(jnp.arange(T), (B, T))
        lens = jnp.asarray([7, 10], jnp.int32)
        e = L.embed_tokens(params, ids)
        logits_ref, _ = L.prefill_kv(cfg, params, e, pos, kv_lens=lens)
        logits_sp, _ = L.prefill_shared_prefix(
            cfg, params, e, pos, prefix_len=P, kv_lens=lens
        )
        np.testing.assert_allclose(
            np.asarray(logits_sp), np.asarray(logits_ref), rtol=2e-4, atol=2e-4
        )
