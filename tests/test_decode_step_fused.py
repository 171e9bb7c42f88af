"""Parity tests for the fused decode megakernel (ops/decode_step.py) against
the scan-based reference path llama.decode_step_split, in Pallas interpret
mode on CPU. Same int8 weights, same int8 prompt KV + scales, same gen-cache
semantics — logits must agree to quantization-noise tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.config import LlamaConfig
from revisionllm_tpu.models import llama
from revisionllm_tpu.ops import decode_step as DS
from revisionllm_tpu.ops.quant import quantize_llama_params
from revisionllm_tpu.ops.rope import rope_angles


def tiny_cfg(layers=2):
    return LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=384,
        num_layers=layers, num_heads=2, num_kv_heads=2, head_dim=128,
        max_position_embeddings=1024, dtype="float32",
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    key = jax.random.PRNGKey(0)
    params = llama.init_params(cfg, key, jnp.float32)
    qparams = quantize_llama_params(params, quantize_lm_head=True)

    B, S = 4, 40  # S not a multiple of 32: exercises the Sp padding path
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(5, cfg.vocab_size, (B, S)), jnp.int32)
    embeds = llama.embed_tokens(qparams, ids).astype(jnp.float32)
    positions = jnp.arange(S)[None, :].repeat(B, 0)
    # ragged prompts
    prompt_lens = jnp.asarray([S, S - 3, S - 7, S - 1], jnp.int32)
    _, prompt_kv = llama.prefill_kv(
        cfg, qparams, embeds, positions, kv_lens=prompt_lens, kv_quant=True
    )
    return cfg, qparams, prompt_kv, prompt_lens, B


def run_reference(cfg, qparams, prompt_kv, prompt_lens, tok_embeds, G, steps):
    B = tok_embeds.shape[0]
    gen = {
        "k": jnp.zeros((cfg.num_layers, B, G, cfg.num_kv_heads, cfg.head_dim),
                       jnp.float32),
        "v": jnp.zeros((cfg.num_layers, B, G, cfg.num_kv_heads, cfg.head_dim),
                       jnp.float32),
    }
    outs = []
    te = tok_embeds
    for s in range(steps):
        logits, gen = llama.decode_step_split(
            cfg, qparams, prompt_kv, prompt_lens, gen, jnp.int32(s), te
        )
        outs.append(np.asarray(logits))
        nxt = jnp.argmax(logits, -1)
        te = llama.embed_tokens(qparams, nxt[:, None]).astype(jnp.float32)
    return outs, gen


def run_fused(cfg, qparams, prompt_kv, prompt_lens, tok_embeds, G, steps):
    B = tok_embeds.shape[0]
    pkv = DS.pack_prompt_kv(prompt_kv)
    genkv = DS.init_gen_cache(
        cfg.num_layers, B, cfg.num_kv_heads, cfg.head_dim, G, jnp.float32
    )
    outs = []
    te = tok_embeds
    for s in range(steps):
        pos = (prompt_lens + s)[:, None]
        cos, sin = rope_angles(pos, cfg.head_dim, cfg.rope_theta)
        hidden, genkv = DS.decode_step_fused(
            qparams, pkv, genkv, prompt_lens, jnp.int32(s),
            te[:, 0, :], cos[:, 0], sin[:, 0],
            eps=cfg.rms_norm_eps, interpret=True,
            block_n=128, block_f=160,  # ragged tail: 384 = 2*160 + 64
        )
        from revisionllm_tpu.ops.norms import rms_norm

        h = rms_norm(hidden[:, None, :], qparams["final_norm"], cfg.rms_norm_eps)
        logits = llama.logits_from_hidden(qparams, h[:, 0]).astype(jnp.float32)
        outs.append(np.asarray(logits))
        nxt = jnp.argmax(logits, -1)
        te = llama.embed_tokens(qparams, nxt[:, None]).astype(jnp.float32)
    return outs, genkv


class TestFusedDecodeParity:
    @pytest.mark.slow
    def test_multi_step_logit_parity(self, setup):
        cfg, qparams, prompt_kv, prompt_lens, B = setup
        rng = np.random.default_rng(2)
        te = jnp.asarray(rng.normal(size=(B, 1, cfg.hidden_size)), jnp.float32)
        G, steps = 8, 3
        ref, ref_gen = run_reference(cfg, qparams, prompt_kv, prompt_lens, te, G, steps)
        fus, fus_gen = run_fused(cfg, qparams, prompt_kv, prompt_lens, te, G, steps)
        for s in range(steps):
            # same tokens chosen at every step
            np.testing.assert_array_equal(
                ref[s].argmax(-1), fus[s].argmax(-1),
                err_msg=f"argmax diverged at step {s}",
            )
            d = np.max(np.abs(ref[s] - fus[s]))
            assert d < 0.15, f"step {s}: max |dlogit| {d}"

    def test_gen_cache_contents(self, setup):
        """The fused kernel's gen-cache writes (slot `step`) must match the
        reference's dynamic_update_slice writes."""
        cfg, qparams, prompt_kv, prompt_lens, B = setup
        rng = np.random.default_rng(3)
        te = jnp.asarray(rng.normal(size=(B, 1, cfg.hidden_size)), jnp.float32)
        G, steps = 8, 2
        _, ref_gen = run_reference(cfg, qparams, prompt_kv, prompt_lens, te, G, steps)
        _, fus_gen = run_fused(cfg, qparams, prompt_kv, prompt_lens, te, G, steps)
        # fused layout [L, 2, B, H, Gp, hd] vs reference [L, B, G, KH, hd]
        fk = np.transpose(np.asarray(fus_gen[:, 0]), (0, 1, 3, 2, 4))[:, :, :steps]
        fv = np.transpose(np.asarray(fus_gen[:, 1]), (0, 1, 3, 2, 4))[:, :, :steps]
        rk = np.asarray(ref_gen["k"])[:, :, :steps]
        rv = np.asarray(ref_gen["v"])[:, :, :steps]
        # the fused kernel dequantizes weight chunks to bf16 before the MXU
        # dot (the TPU path); the CPU reference dequantizes to f32 — small
        # systematic rounding difference, not a layout bug
        np.testing.assert_allclose(fk, rk, atol=5e-2, rtol=5e-2)
        np.testing.assert_allclose(fv, rv, atol=5e-2, rtol=5e-2)

    def test_pack_prompt_kv_layout(self, setup):
        """Head-major combined-KV pack keeps values/scales aligned."""
        cfg, qparams, prompt_kv, _, _ = setup
        pkv = DS.pack_prompt_kv(prompt_kv)
        L, B, two, H, Sp, hd = pkv["kv"].shape
        S = prompt_kv["k"].shape[2]
        k = np.asarray(prompt_kv["k"])  # [L, B, S, KH, hd]
        np.testing.assert_array_equal(
            np.asarray(pkv["kv"])[:, :, 0, :, :S],
            np.transpose(k, (0, 1, 3, 2, 4)),
        )
        ks = np.asarray(prompt_kv["k_scale"])  # [L, B, S, KH]
        np.testing.assert_allclose(
            np.asarray(pkv["kvsc"])[:, :, 0, :, :S],
            np.transpose(ks, (0, 1, 3, 2)).astype(np.float32),
        )
        assert Sp % 32 == 0
