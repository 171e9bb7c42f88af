"""ChatGLM2 backbone-path tests: partial interleaved rotary, qkv bias,
packed-tensor conversion, decode parity, and GLM preprocessing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.config import LlamaConfig
from revisionllm_tpu.models import llama
from revisionllm_tpu.models.convert import convert_chatglm
from revisionllm_tpu.ops.rope import apply_rope_interleaved, rope_angles


def tiny_glm_cfg():
    return LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, dtype="float32",
        rope_fraction=0.5, rope_interleaved=True, qkv_bias=True,
    )


class TestInterleavedRope:
    def test_matches_manual(self):
        B, T, H, hd = 1, 3, 2, 8
        rot = 4
        x = np.random.default_rng(0).normal(size=(B, T, H, hd)).astype(np.float32)
        pos = jnp.arange(T)[None]
        cos, sin = rope_angles(pos, rot, 10000.0)
        out = np.asarray(apply_rope_interleaved(jnp.asarray(x), cos, sin, rot))
        # manual: pairs (0,1),(2,3) rotate; dims 4.. pass through
        inv = 1.0 / (10000.0 ** (np.arange(0, rot, 2) / rot))
        for t in range(T):
            ang = t * inv  # [rot/2]
            c, s = np.cos(ang), np.sin(ang)
            for h in range(H):
                x1 = x[0, t, h, 0:rot:2]
                x2 = x[0, t, h, 1:rot:2]
                np.testing.assert_allclose(out[0, t, h, 0:rot:2], x1 * c - x2 * s, rtol=1e-5)
                np.testing.assert_allclose(out[0, t, h, 1:rot:2], x2 * c + x1 * s, rtol=1e-5)
            np.testing.assert_allclose(out[0, t, :, rot:], x[0, t, :, rot:], rtol=1e-6)

    def test_position_zero_identity(self):
        x = jnp.ones((1, 1, 2, 8))
        cos, sin = rope_angles(jnp.zeros((1, 1), jnp.int32), 4, 10000.0)
        out = apply_rope_interleaved(x, cos, sin, 4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)


class TestGlmBackbone:
    def test_forward_and_decode_parity(self):
        cfg = tiny_glm_cfg()
        params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        assert "q_bias" in params["layers"]
        # nonzero biases so the path is exercised
        params["layers"]["q_bias"] = params["layers"]["q_bias"] + 0.1
        params["layers"]["k_bias"] = params["layers"]["k_bias"] - 0.05

        B, P = 1, 6
        ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (B, P + 2)))
        pos = jnp.broadcast_to(jnp.arange(P + 2), (B, P + 2))
        full = llama.forward_hidden(cfg, params, llama.embed_tokens(params, ids), pos)
        full_logits = llama.logits_from_hidden(params, full)

        cache = llama.init_kv_cache(cfg, B, P + 4, jnp.float32)
        logits, cache = llama.prefill(
            cfg, params, llama.embed_tokens(params, ids[:, :P]), pos[:, :P], cache
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full_logits[:, P - 1]), rtol=1e-4, atol=1e-4
        )
        lens = jnp.full((B,), P, jnp.int32)
        logits2, _ = llama.decode_step(
            cfg, params, cache, lens, llama.embed_tokens(params, ids[:, P : P + 1])
        )
        np.testing.assert_allclose(
            np.asarray(logits2), np.asarray(full_logits[:, P]), rtol=1e-4, atol=1e-4
        )


class TestGlmConversion:
    def test_packed_split(self):
        cfg = tiny_glm_cfg()
        rng = np.random.default_rng(1)
        q_out, kv_out, ffn, D = 64, 32, 96, 64
        state = {}
        state["transformer.embedding.word_embeddings.weight"] = rng.normal(size=(256, D)).astype(np.float32)
        state["transformer.encoder.final_layernorm.weight"] = np.ones(D, np.float32)
        state["transformer.output_layer.weight"] = rng.normal(size=(256, D)).astype(np.float32)
        for i in range(2):
            pre = f"transformer.encoder.layers.{i}"
            state[f"{pre}.self_attention.query_key_value.weight"] = rng.normal(
                size=(q_out + 2 * kv_out, D)
            ).astype(np.float32)
            state[f"{pre}.self_attention.query_key_value.bias"] = rng.normal(
                size=(q_out + 2 * kv_out,)
            ).astype(np.float32)
            state[f"{pre}.self_attention.dense.weight"] = rng.normal(size=(D, q_out)).astype(np.float32)
            state[f"{pre}.mlp.dense_h_to_4h.weight"] = rng.normal(size=(2 * ffn, D)).astype(np.float32)
            state[f"{pre}.mlp.dense_4h_to_h.weight"] = rng.normal(size=(D, ffn)).astype(np.float32)
            state[f"{pre}.input_layernorm.weight"] = np.ones(D, np.float32)
            state[f"{pre}.post_attention_layernorm.weight"] = np.ones(D, np.float32)

        params = convert_chatglm(state, cfg)
        assert params["layers"]["q_proj"].shape == (2, D, q_out)
        assert params["layers"]["k_proj"].shape == (2, D, kv_out)
        assert params["layers"]["gate_proj"].shape == (2, D, ffn)
        # split correctness: q rows of the packed matrix = q_proj columns
        w = state["transformer.encoder.layers.0.self_attention.query_key_value.weight"]
        np.testing.assert_allclose(params["layers"]["q_proj"][0], w[:q_out].T)
        np.testing.assert_allclose(params["layers"]["up_proj"][0],
                                   state["transformer.encoder.layers.0.mlp.dense_h_to_4h.weight"][ffn:].T)
        # converted model runs
        jp = jax.tree.map(jnp.asarray, params)
        ids = jnp.arange(8)[None]
        h = llama.forward_hidden(cfg, jp, llama.embed_tokens(jp, ids), jnp.arange(8)[None])
        assert np.isfinite(np.asarray(h)).all()


class GlmFakeTokenizer:
    eos_token_id = 2
    bos_token_id = None

    def __init__(self):
        self.vocab = {}
        self.commands = {"[gMASK]": 900, "sop": 901, "<|user|>": 902, "<|assistant|>": 903}

    def get_command(self, name):
        return self.commands[name]

    def __call__(self, text):
        class R:
            pass

        r = R()
        ids = [990, 991]  # GLM prefixes two special tokens
        for w in text.split():
            if w not in self.vocab:
                self.vocab[w] = len(self.vocab) + 10
            ids.append(self.vocab[w])
        r.input_ids = ids
        return r


class TestGlmPreprocess:
    def test_loss_on_assistant_only(self):
        from revisionllm_tpu.data.preprocess import preprocess_glm

        tok = GlmFakeTokenizer()
        convs = [
            {"from": "human", "value": "when does it happen"},
            {"from": "gpt", "value": "From 10 to 20."},
        ]
        out = preprocess_glm(convs, tok)
        ids, labels = out["input_ids"], out["labels"]
        assert ids[0] == 900 and ids[1] == 901
        # human tokens all ignored
        user_pos = np.where(ids == 902)[0][0]
        asst_pos = np.where(ids == 903)[0][0]
        assert (labels[: asst_pos + 1] == -100).all()
        # assistant answer supervised (shifted by one)
        assert (labels[asst_pos + 1 :] != -100).any()


class TestGlmGenerate:
    @pytest.mark.slow
    def test_generate_matches_stepwise(self):
        """The split-KV decode loop must stay exact under MQA (2 kv heads),
        partial interleaved rotary, and qkv bias."""
        cfg = tiny_glm_cfg()
        params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        params["layers"]["q_bias"] = params["layers"]["q_bias"] + 0.05

        from revisionllm_tpu.models import generation

        B, P, G = 2, 5, 4
        ids = jnp.asarray(np.random.default_rng(2).integers(3, cfg.vocab_size, (B, P)))
        embeds = llama.embed_tokens(params, ids)
        pos = jnp.broadcast_to(jnp.arange(P), (B, P))
        lens = jnp.full((B,), P, jnp.int32)
        out = generation.generate(cfg, params, embeds, pos, lens, eos_id=2, max_new_tokens=G)

        # naive: full forward each step
        cur = np.asarray(ids)
        for g in range(G):
            T = cur.shape[1]
            h = llama.forward_hidden(
                cfg, params, llama.embed_tokens(params, jnp.asarray(cur)),
                jnp.broadcast_to(jnp.arange(T), (B, T)),
            )
            nxt = np.asarray(jnp.argmax(llama.logits_from_hidden(params, h)[:, -1], -1))
            for b in range(B):
                if np.asarray(out["valid"][b, g]):
                    assert int(out["tokens"][b, g]) == nxt[b], f"step {g} row {b}"
            cur = np.concatenate([cur, nxt[:, None]], axis=1)
