"""Parity tests for the serving-layout fused decode step (ops/decode_serve.py)
against the scan-based reference path llama.decode_step_split, in Pallas
interpret mode on CPU. Differences vs the round-2 megakernel tests: weights
arrive pre-chunked (pack_serving_weights) and generated k/v live QUANTIZED in
the unified slab, so multi-step parity additionally covers the landed-int8
gen path (KV8-class noise on prior generated tokens)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.config import LlamaConfig
from revisionllm_tpu.models import llama
from revisionllm_tpu.ops import decode_serve as DSV
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
    return outs


def run_serve(cfg, qparams, prompt_kv, prompt_lens, tok_embeds, G, steps, nb):
    packed = DSV.pack_serving_weights(
        qparams["layers"], block_n=128, block_f=160  # ragged: 384 = 2*160+64
    )
    slab, s0 = DSV.pack_unified_kv(prompt_kv, gen_slots=G)
    outs = []
    te = tok_embeds
    for s in range(steps):
        pos = (prompt_lens + s)[:, None]
        cos, sin = rope_angles(pos, cfg.head_dim, cfg.rope_theta)
        hidden, slab = DSV.decode_step_serve(
            packed, slab, prompt_lens, jnp.int32(s),
            te[:, 0, :], cos[:, 0], sin[:, 0],
            s0=s0, eps=cfg.rms_norm_eps, interpret=True, nb=nb,
        )
        from revisionllm_tpu.ops.norms import rms_norm

        h = rms_norm(hidden[:, None, :], qparams["final_norm"], cfg.rms_norm_eps)
        logits = llama.logits_from_hidden(qparams, h[:, 0]).astype(jnp.float32)
        outs.append(np.asarray(logits))
        nxt = jnp.argmax(logits, -1)
        te = llama.embed_tokens(qparams, nxt[:, None]).astype(jnp.float32)
    return outs, slab, s0


class TestPackServingWeights:
    def test_roundtrip(self, setup):
        cfg, qparams, *_ = setup
        packed = DSV.pack_serving_weights(qparams["layers"], 128, 160)
        un = DSV.unpack_serving_weights(packed)
        for name in DSV.COL_MATS:
            orig = np.asarray(qparams["layers"][name]["q8"])
            N = orig.shape[-1]
            np.testing.assert_array_equal(np.asarray(un[name]["q8"])[..., :N], orig)
            # padded columns must carry zero scale (outputs exactly 0)
            sc = np.asarray(packed[name]["scale"])
            if sc.shape[-1] > N:
                assert np.all(sc[..., N:] == 0.0)
        origd = np.asarray(qparams["layers"]["down_proj"]["q8"])
        F = origd.shape[1]
        np.testing.assert_array_equal(
            np.asarray(un["down_proj"]["q8r_unpacked"])[:, :F], origd
        )

    def test_unified_slab_layout(self, setup):
        cfg, qparams, prompt_kv, _, _ = setup
        G = 8
        slab, s0 = DSV.pack_unified_kv(prompt_kv, gen_slots=G)
        L, B, two, H, Sp, hd = slab["kv"].shape
        S = prompt_kv["k"].shape[2]
        assert s0 == S
        assert Sp % 128 == 0 and Sp >= S + G
        k = np.asarray(prompt_kv["k"])
        np.testing.assert_array_equal(
            np.asarray(slab["kv"])[:, :, 0, :, :S],
            np.transpose(k, (0, 1, 3, 2, 4)),
        )
        ks = np.asarray(prompt_kv["k_scale"])
        np.testing.assert_allclose(
            np.asarray(slab["kvsc"])[:, :, 0, :, :S],
            np.transpose(ks, (0, 1, 3, 2)).astype(np.float32),
        )


class TestServeDecodeParity:
    @pytest.mark.slow
    @pytest.mark.parametrize("nb", [1, 2])
    def test_multi_step_logit_parity(self, setup, nb):
        cfg, qparams, prompt_kv, prompt_lens, B = setup
        rng = np.random.default_rng(2)
        te = jnp.asarray(rng.normal(size=(B, 1, cfg.hidden_size)), jnp.float32)
        G, steps = 8, 3
        ref = run_reference(cfg, qparams, prompt_kv, prompt_lens, te, G, steps)
        srv, _, _ = run_serve(cfg, qparams, prompt_kv, prompt_lens, te, G, steps, nb)
        for s in range(steps):
            np.testing.assert_array_equal(
                ref[s].argmax(-1), srv[s].argmax(-1),
                err_msg=f"argmax diverged at step {s} (nb={nb})",
            )
            d = np.max(np.abs(ref[s] - srv[s]))
            # steps > 0 additionally read int8-landed gen kv (KV8-class noise)
            assert d < 0.2, f"step {s}: max |dlogit| {d}"

    @pytest.mark.slow
    def test_landed_gen_kv(self, setup):
        """Generated k/v must land quantized at slab positions s0+step with
        matching scales (dequantized round-trip close to the float values)."""
        cfg, qparams, prompt_kv, prompt_lens, B = setup
        rng = np.random.default_rng(3)
        te = jnp.asarray(rng.normal(size=(B, 1, cfg.hidden_size)), jnp.float32)
        G, steps = 8, 2
        _, slab, s0 = run_serve(
            cfg, qparams, prompt_kv, prompt_lens, te, G, steps, nb=2
        )
        kv = np.asarray(slab["kv"])
        sc = np.asarray(slab["kvsc"])
        for s in range(steps):
            q8 = kv[:, :, :, :, s0 + s, :].astype(np.float32)
            scale = sc[:, :, :, :, s0 + s]
            deq = q8 * scale[..., None]
            # landed rows must be non-trivial and bounded by int8 range
            assert np.any(q8 != 0)
            assert np.all(np.abs(q8) <= 127)
            # scale reconstructs the absmax (|q8|max == 127 where scale > tiny)
            mx = np.abs(q8).max(axis=-1)
            assert np.all((mx == 127) | (np.abs(deq).max(axis=-1) < 1e-6))


class TestChunkedApply:
    """q8_apply over the packed serving layout must match the standard
    {'q8','scale'} path (prefill/scan-decode consume the pack through it)."""

    def test_col_chunks_match_standard(self, setup):
        from revisionllm_tpu.ops.quant import pack_serving_weights_host, q8_apply

        cfg, qparams, *_ = setup
        packed = pack_serving_weights_host(
            jax.tree.map(np.asarray, qparams["layers"]), block_n=128, block_f=160
        )
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(5, cfg.hidden_size)), jnp.float32)
        for name in ("q_proj", "gate_proj"):
            lw = qparams["layers"][name]
            std = q8_apply(
                x, {"q8": lw["q8"][0], "scale": lw["scale"][0]}, use_pallas=False
            )
            w = packed[name]
            ch = q8_apply(
                x, {"q8c": jnp.asarray(w["q8c"][0]), "scale": jnp.asarray(w["scale"][0])},
                use_pallas=False,
            )
            N = std.shape[-1]
            np.testing.assert_allclose(
                np.asarray(ch)[..., :N], np.asarray(std), rtol=1e-5, atol=1e-5
            )
            # padded tail (zero scale) must be exactly zero
            assert np.all(np.asarray(ch)[..., N:] == 0.0)

    def test_row_chunks_match_standard(self, setup):
        from revisionllm_tpu.ops.quant import pack_serving_weights_host, q8_apply

        cfg, qparams, *_ = setup
        packed = pack_serving_weights_host(
            jax.tree.map(np.asarray, qparams["layers"]), block_n=128, block_f=160
        )
        F = cfg.intermediate_size
        w = packed["down_proj"]
        Fp = w["q8r"].shape[1] * w["q8r"].shape[2]
        rng = np.random.default_rng(8)
        x = np.zeros((5, Fp), np.float32)
        x[:, :F] = rng.normal(size=(5, F))
        lw = qparams["layers"]["down_proj"]
        std = q8_apply(
            jnp.asarray(x[:, :F]),
            {"q8": lw["q8"][0], "scale": lw["scale"][0]}, use_pallas=False,
        )
        ch = q8_apply(
            jnp.asarray(x),
            {"q8r": jnp.asarray(w["q8r"][0]), "scale": jnp.asarray(w["scale"][0])},
            use_pallas=False,
        )
        np.testing.assert_allclose(np.asarray(ch), np.asarray(std), rtol=2e-3, atol=2e-3)


class TestGenerateServePath:
    """generation.generate must route decode through the serve kernel when
    params carry the packed layout (and fall back cleanly when REVISIONLLM_
    SERVE=0): prefill consumes the pack via q8_apply's chunked dispatch, the
    unified slab replaces the split gen cache."""

    def test_generate_with_packed_params(self, setup):
        from revisionllm_tpu.models import generation

        cfg, qparams, _, _, B = setup
        S = 40
        rng = np.random.default_rng(11)
        ids = jnp.asarray(rng.integers(5, cfg.vocab_size, (B, S)), jnp.int32)
        embeds = llama.embed_tokens(qparams, ids).astype(jnp.float32)
        positions = jnp.arange(S)[None, :].repeat(B, 0)
        prompt_lens = jnp.asarray([S, S - 3, S - 7, S - 1], jnp.int32)

        packed = dict(qparams)
        packed["layers"] = DSV.pack_serving_weights(
            qparams["layers"], block_n=128, block_f=160
        )
        generation.set_kv8(True)
        try:
            ref = generation.generate(
                cfg, qparams, embeds, positions, prompt_lens,
                eos_id=2, max_new_tokens=4,
            )
            out = generation.generate(
                cfg, packed, embeds, positions, prompt_lens,
                eos_id=2, max_new_tokens=4,
            )
        finally:
            generation.set_kv8(None)
        assert out["tokens"].shape == (B, 4)
        # step 0 sees only the (identically quantized) prompt KV: exact match
        np.testing.assert_array_equal(
            np.asarray(out["tokens"][:, 0]), np.asarray(ref["tokens"][:, 0])
        )
        assert np.isfinite(np.asarray(out["entropy"])).all()

    def test_serve_opt_out_env(self, setup, monkeypatch):
        from revisionllm_tpu.models import generation

        cfg, qparams, _, _, B = setup
        packed = dict(qparams)
        packed["layers"] = DSV.pack_serving_weights(
            qparams["layers"], block_n=128, block_f=160
        )
        monkeypatch.setenv("REVISIONLLM_SERVE", "0")
        generation.set_serve(None)  # force env re-read
        generation.set_kv8(True)
        try:
            # packed params + serve disabled -> scan path must still work
            # through q8_apply's chunked dispatch
            S = 24
            rng = np.random.default_rng(12)
            ids = jnp.asarray(rng.integers(5, cfg.vocab_size, (B, S)), jnp.int32)
            embeds = llama.embed_tokens(qparams, ids).astype(jnp.float32)
            positions = jnp.arange(S)[None, :].repeat(B, 0)
            prompt_lens = jnp.full((B,), S, jnp.int32)
            out = generation.generate(
                cfg, packed, embeds, positions, prompt_lens,
                eos_id=2, max_new_tokens=2,
            )
            assert out["tokens"].shape == (B, 2)
        finally:
            generation.set_kv8(None)
            generation.set_serve(None)


class TestChunkedW8A8:
    """The one-dot col-chunk W8A8 path must match the standard w8a8_matmul
    bitwise (same int8 accumulation, different weight layout), and its
    straight-through VJP must pass gradients to x."""

    def test_w8a8_colchunk_matches_standard(self, setup):
        from revisionllm_tpu.ops import quant as Q

        cfg, qparams, *_ = setup
        lw = qparams["layers"]["q_proj"]
        packed = DSV.pack_serving_weights(qparams["layers"], block_n=128, block_f=160)
        rng = np.random.default_rng(21)
        # M > pallas_max_m so the W8A8 branch engages
        x = jnp.asarray(rng.normal(size=(300, cfg.hidden_size)), jnp.float32)
        Q.set_w8a8(True)
        try:
            std = Q.q8_apply(x, {"q8": lw["q8"][0], "scale": lw["scale"][0]})
            ch = Q.q8_apply(
                x,
                {"q8c": packed["q_proj"]["q8c"][0],
                 "scale": packed["q_proj"]["scale"][0]},
            )
        finally:
            Q.set_w8a8(None)
        np.testing.assert_array_equal(np.asarray(std), np.asarray(ch))

    def test_w8a8_colchunk_grad_flows(self, setup):
        from revisionllm_tpu.ops import quant as Q

        cfg, qparams, *_ = setup
        packed = DSV.pack_serving_weights(qparams["layers"], block_n=128, block_f=160)
        w = {"q8c": packed["q_proj"]["q8c"][0], "scale": packed["q_proj"]["scale"][0]}
        rng = np.random.default_rng(22)
        x = jnp.asarray(rng.normal(size=(300, cfg.hidden_size)), jnp.float32)
        Q.set_w8a8(True)
        try:
            g = jax.grad(lambda x: jnp.sum(Q.q8_apply(x, w) ** 2))(x)
        finally:
            Q.set_w8a8(None)
        gn = np.asarray(jnp.abs(g).max())
        assert np.isfinite(gn) and gn > 0.0
