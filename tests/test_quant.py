"""Int8 quantization + Pallas quantized matmul tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.config import LlamaConfig
from revisionllm_tpu.models import llama
from revisionllm_tpu.ops.quant import (
    dequantize_int8,
    int8_matmul,
    q8_apply,
    quantize_int8,
    quantize_llama_params,
)


class TestQuantize:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
        q, s = quantize_int8(w)
        assert q.dtype == jnp.int8 and s.shape == (32,)
        deq = dequantize_int8(q, s, jnp.float32)
        err = np.abs(np.asarray(deq) - np.asarray(w))
        # absmax scheme: error <= scale/2 per channel
        assert (err <= np.asarray(s) / 2 + 1e-6).all()

    def test_zero_channel_safe(self):
        w = jnp.zeros((8, 4))
        q, s = quantize_int8(w)
        assert np.isfinite(np.asarray(s)).all()
        np.testing.assert_array_equal(np.asarray(dequantize_int8(q, s)), 0)

    def test_stacked_layers(self):
        w = jnp.asarray(np.random.default_rng(1).normal(size=(3, 16, 8)), jnp.float32)
        q, s = quantize_int8(w)
        assert q.shape == (3, 16, 8) and s.shape == (3, 8)


class TestInt8Matmul:
    def test_matches_dequant_reference(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(16, 256)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
        q, s = quantize_int8(w)
        want = np.asarray(x @ dequantize_int8(q, s, jnp.float32))
        got = np.asarray(int8_matmul(x, q, s, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    def test_unaligned_shapes(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(5, 100)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(100, 70)).astype(np.float32))
        q, s = quantize_int8(w)
        want = np.asarray(x @ dequantize_int8(q, s, jnp.float32))
        got = np.asarray(int8_matmul(x, q, s, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
        assert got.shape == (5, 70)

    def test_batched_leading_dims(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(2, 3, 64)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
        q, s = quantize_int8(w)
        got = q8_apply(x, {"q8": q, "scale": s}, use_pallas=False)
        assert got.shape == (2, 3, 48)


class TestQuantizedLlama:
    def test_quantized_forward_close_to_dense(self):
        cfg = LlamaConfig.tiny()
        cfg = cfg.__class__(**{**cfg.__dict__, "dtype": "float32"})
        params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        qparams = quantize_llama_params(params)
        assert qparams["layers"]["q_proj"]["q8"].dtype == jnp.int8
        assert qparams["layers"]["attn_norm"].dtype == jnp.float32  # norms kept

        ids = jnp.arange(12)[None] % cfg.vocab_size
        pos = jnp.arange(12)[None]
        e = llama.embed_tokens(params, ids)
        h_dense = llama.forward_hidden(cfg, params, e, pos)
        h_q = llama.forward_hidden(cfg, qparams, e, pos)
        # int8 noise but same predictions structure
        corr = np.corrcoef(
            np.asarray(h_dense).ravel(), np.asarray(h_q).ravel()
        )[0, 1]
        assert corr > 0.99

    def test_quantized_decode_parity_with_quantized_forward(self):
        cfg = LlamaConfig.tiny()
        cfg = cfg.__class__(**{**cfg.__dict__, "dtype": "float32"})
        params = quantize_llama_params(
            llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        )
        B, P = 1, 6
        ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (B, P + 2)))
        pos = jnp.broadcast_to(jnp.arange(P + 2), (B, P + 2))
        full = llama.forward_hidden(
            cfg, params, llama.embed_tokens(params, ids), pos
        )
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


class TestW8A8:
    def test_w8a8_close_to_fp(self):
        from revisionllm_tpu.ops.quant import w8a8_matmul

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(32, 128)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))
        q, s = quantize_int8(w)
        got = np.asarray(w8a8_matmul(x, q, s))
        want = np.asarray(x @ w)
        # two int8 quantizations: ~1-2% relative error on random gaussians
        rel = np.abs(got - want) / (np.abs(want) + 1.0)
        assert rel.mean() < 0.02

    def test_w8a8_batched(self):
        from revisionllm_tpu.ops.quant import w8a8_matmul

        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=(2, 5, 64)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
        q, s = quantize_int8(w)
        out = w8a8_matmul(x, q, s)
        assert out.shape == (2, 5, 32)

    def test_zero_rows_safe(self):
        from revisionllm_tpu.ops.quant import w8a8_matmul

        x = jnp.zeros((4, 16))
        w = jnp.ones((16, 8))
        q, s = quantize_int8(w)
        out = np.asarray(w8a8_matmul(x, q, s))
        np.testing.assert_allclose(out, 0.0)

    def test_straight_through_gradient(self):
        """jax.grad through w8a8_matmul must NOT be killed by round()'s zero
        derivative (ADVICE r2): the custom VJP backprops g @ W_dequant^T."""
        from revisionllm_tpu.ops.quant import dequantize_int8, w8a8_matmul

        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
        q, s = quantize_int8(w)

        g = jax.grad(lambda x: jnp.sum(w8a8_matmul(x, q, s) ** 2))(x)
        assert float(jnp.abs(g).max()) > 0.0
        # matches the exact-dequant gradient (same residual up to quant noise)
        wd = dequantize_int8(q, s, jnp.float32)
        g_exact = jax.grad(lambda x: jnp.sum((x @ wd) ** 2))(x)
        rel = np.abs(np.asarray(g) - np.asarray(g_exact)) / (
            np.abs(np.asarray(g_exact)) + 1.0
        )
        assert rel.mean() < 0.05

    def test_explicit_exact_path_bypasses_w8a8(self):
        """q8_apply(use_pallas=False) is an exact-path request even when the
        W8A8 default is forced on (ADVICE r2 medium)."""
        from revisionllm_tpu.ops.quant import (
            dequantize_int8, q8_apply, set_w8a8,
        )

        rng = np.random.default_rng(9)
        # M=512 > pallas_max_m so the large-M branch is in play
        x = jnp.asarray(rng.normal(size=(512, 64)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
        q, s = quantize_int8(w)
        wd = {"q8": q, "scale": s}
        set_w8a8(True)
        try:
            lossy = np.asarray(q8_apply(x, wd))
            exact = np.asarray(q8_apply(x, wd, use_pallas=False))
        finally:
            set_w8a8(None)
        want = np.asarray(x @ dequantize_int8(q, s, jnp.float32))
        np.testing.assert_allclose(exact, want, rtol=1e-5, atol=1e-5)
        assert np.abs(lossy - want).max() > 0  # W8A8 did engage by default


class TestInt4:
    def test_pack_unpack_roundtrip(self):
        from revisionllm_tpu.ops.quant import quantize_int4, unpack_int4

        rng = np.random.default_rng(7)
        w = jnp.asarray(rng.normal(size=(256, 64)).astype(np.float32))
        packed, scale = quantize_int4(w, group=128)
        assert packed.shape == (128, 64) and packed.dtype == jnp.uint8
        assert scale.shape == (2, 64)
        q = np.asarray(unpack_int4(packed))
        assert q.min() >= -8 and q.max() <= 7

    def test_dequant_error_bounded(self):
        from revisionllm_tpu.ops.quant import dequantize_int4, quantize_int4

        rng = np.random.default_rng(8)
        w = jnp.asarray(rng.normal(size=(256, 32)).astype(np.float32))
        packed, scale = quantize_int4(w, group=128)
        deq = np.asarray(dequantize_int4(packed, scale, jnp.float32))
        # absmax int4: error <= scale/2 per group
        s_full = np.repeat(np.asarray(scale), 128, axis=0)
        assert (np.abs(deq - np.asarray(w)) <= s_full / 2 + 1e-5).all()

    def test_int4_matmul_matches_dequant(self):
        from revisionllm_tpu.ops.quant import (
            dequantize_int4,
            int4_matmul,
            quantize_int4,
        )

        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(size=(16, 256)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
        packed, scale = quantize_int4(w, group=128)
        want = np.asarray(x @ dequantize_int4(packed, scale, jnp.float32))
        got = np.asarray(int4_matmul(x, packed, scale, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    @pytest.mark.slow
    def test_int4_llama_forward(self):
        from revisionllm_tpu.ops.quant import quantize_llama_params_int4

        cfg = LlamaConfig(
            vocab_size=256, hidden_size=128, intermediate_size=256, num_layers=2,
            num_heads=4, num_kv_heads=4, head_dim=32, dtype="float32",
        )
        params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        from revisionllm_tpu.ops.quant import dequantize_int4

        q4 = quantize_llama_params_int4(params)
        assert q4["layers"]["q_proj"]["q4"].dtype == jnp.uint8

        # explicit-dequant params: the q4 dispatch path must match exactly
        deq = dict(q4)
        deq["layers"] = {
            k: dequantize_int4(v["q4"], v["scale4"], jnp.float32)
            if isinstance(v, dict) else v
            for k, v in q4["layers"].items()
        }
        deq["lm_head"] = dequantize_int4(
            q4["lm_head"]["q4"], q4["lm_head"]["scale4"], jnp.float32
        )
        ids = jnp.arange(12)[None] % cfg.vocab_size
        pos = jnp.arange(12)[None]
        e = llama.embed_tokens(params, ids)
        h_q4 = llama.forward_hidden(cfg, q4, e, pos)
        h_deq = llama.forward_hidden(cfg, deq, e, pos)
        np.testing.assert_allclose(
            np.asarray(h_q4), np.asarray(h_deq), rtol=1e-4, atol=1e-4
        )

        # and stays correlated with the fp32 forward (int4 on random-init
        # tiny weights is worst-case; real checkpoints land far higher)
        h_fp = llama.forward_hidden(cfg, params, e, pos)
        corr = np.corrcoef(np.asarray(h_fp).ravel(), np.asarray(h_q4).ravel())[0, 1]
        assert corr > 0.9, corr


class TestQ8ApplyMulti:
    """Shared-activation-quantization multi-matmul: must be bit-exact vs
    separate w8a8_matmul calls, fall back cleanly, and pass gradients."""

    def _mk(self, seed, n_out=(48, 48, 32)):
        from revisionllm_tpu.ops.quant import quantize_int8

        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(300, 64)).astype(np.float32))
        ws = []
        for i, n in enumerate(n_out):
            w = rng.normal(size=(64, n)).astype(np.float32)
            q, s = quantize_int8(jnp.asarray(w))
            ws.append({"q8": q, "scale": s})
        return x, tuple(ws)

    def test_bit_exact_vs_separate_w8a8(self):
        from revisionllm_tpu.ops import quant as Q

        x, ws = self._mk(31)
        Q.set_w8a8(True)
        try:
            multi = Q.q8_apply_multi(x, ws)
            single = [Q.w8a8_matmul(x, w["q8"], w["scale"]) for w in ws]
        finally:
            Q.set_w8a8(None)
        for m, s in zip(multi, single):
            np.testing.assert_array_equal(np.asarray(m), np.asarray(s))

    def test_fallback_small_m_exact(self):
        """M <= pallas_max_m must take the per-matrix (exact dequant on CPU)
        path — identical to q8_apply."""
        from revisionllm_tpu.ops import quant as Q

        x, ws = self._mk(32)
        x_small = x[:8]
        Q.set_w8a8(True)
        try:
            multi = Q.q8_apply_multi(x_small, ws)
            single = [Q.q8_apply(x_small, w) for w in ws]
        finally:
            Q.set_w8a8(None)
        for m, s in zip(multi, single):
            np.testing.assert_array_equal(np.asarray(m), np.asarray(s))

    def test_fallback_w8a8_off(self):
        from revisionllm_tpu.ops import quant as Q

        x, ws = self._mk(33)
        Q.set_w8a8(False)
        try:
            multi = Q.q8_apply_multi(x, ws)
            single = [Q.q8_apply(x, w) for w in ws]
        finally:
            Q.set_w8a8(None)
        for m, s in zip(multi, single):
            np.testing.assert_array_equal(np.asarray(m), np.asarray(s))

    def test_explicit_exact_request(self):
        from revisionllm_tpu.ops import quant as Q

        x, ws = self._mk(34)
        Q.set_w8a8(True)
        try:
            multi = Q.q8_apply_multi(x, ws, use_pallas=False)
            single = [Q.q8_apply(x, w, use_pallas=False) for w in ws]
        finally:
            Q.set_w8a8(None)
        for m, s in zip(multi, single):
            np.testing.assert_array_equal(np.asarray(m), np.asarray(s))

    def test_gradient_flows_and_matches_dequant(self):
        from revisionllm_tpu.ops import quant as Q

        x, ws = self._mk(35)
        Q.set_w8a8(True)
        try:
            def loss_multi(x):
                outs = Q.q8_apply_multi(x, ws)
                return sum(jnp.sum(o ** 2) for o in outs)

            g = jax.grad(loss_multi)(x)

            def loss_exact(x):
                outs = [
                    x @ Q.dequantize_int8(w["q8"], w["scale"], jnp.float32)
                    for w in ws
                ]
                return sum(jnp.sum(o ** 2) for o in outs)

            g_ref = jax.grad(loss_exact)(x)
        finally:
            Q.set_w8a8(None)
        gn = np.asarray(jnp.abs(g).max())
        assert np.isfinite(gn) and gn > 0.0
        # straight-through: direction matches the exact-dequant gradient
        cos = np.sum(np.asarray(g) * np.asarray(g_ref)) / (
            np.linalg.norm(np.asarray(g)) * np.linalg.norm(np.asarray(g_ref))
        )
        assert cos > 0.98

    def test_plain_array_weights_fall_back(self):
        from revisionllm_tpu.ops import quant as Q

        rng = np.random.default_rng(36)
        x = jnp.asarray(rng.normal(size=(300, 64)).astype(np.float32))
        ws = (
            jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32)),
        )
        outs = Q.q8_apply_multi(x, ws)
        for o, w in zip(outs, ws):
            np.testing.assert_allclose(np.asarray(o), np.asarray(x @ w), rtol=1e-5)


class TestFusedMlp:
    def test_fused_mlp_matches_reference(self):
        """w8a8_mlp_fused (Pallas, interpret) is bit-exact vs the jnp
        transcription of its math, incl. K/M padding tails."""
        from revisionllm_tpu.ops.quant import w8a8_mlp_fused, w8a8_mlp_reference

        rng = np.random.default_rng(3)
        M, K, N = 37, 80, 256  # deliberately unaligned M/K
        xq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
        xs = jnp.asarray(np.abs(rng.normal(size=(M, 1))) * 0.01 + 1e-3, jnp.float32)
        gq = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
        uq = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
        gs = jnp.asarray(np.abs(rng.normal(size=(N,))) * 2e-3 + 1e-4, jnp.float32)
        us = jnp.asarray(np.abs(rng.normal(size=(N,))) * 2e-3 + 1e-4, jnp.float32)
        hq, hs = w8a8_mlp_fused(xq, xs, gq, gs, uq, us,
                                block_m=16, block_k=32, interpret=True)
        hq2, hs2 = w8a8_mlp_reference(xq, xs, gq, gs, uq, us)
        np.testing.assert_allclose(np.asarray(hs), np.asarray(hs2), rtol=1e-6)
        assert (np.abs(np.asarray(hq, int) - np.asarray(hq2, int)) <= 1).all()
        assert (np.asarray(hq, int) == np.asarray(hq2, int)).mean() > 0.999

    def test_fused_mlp_block_end_to_end(self, monkeypatch):
        """REVISIONLLM_FUSED_MLP routes _mlp_block through the fused path;
        output stays close to the separate-W8A8 chain (only the extra h
        quantization differs)."""
        import revisionllm_tpu.models.llama as llama_mod
        from revisionllm_tpu.ops import quant

        monkeypatch.setattr(llama_mod, "_FUSED_MLP", None)
        monkeypatch.setenv("REVISIONLLM_FUSED_MLP", "1")
        quant.set_w8a8(True)
        try:
            rng = np.random.default_rng(5)
            D, F = 64, 128
            x = jnp.asarray(rng.normal(size=(2, 24, D)) * 0.3, jnp.float32)
            mk = lambda k, n: quant.quantize_int8(
                jnp.asarray(rng.normal(size=(k, n)) * 0.05, jnp.float32))
            lp = {}
            for name, (k, n) in {"gate_proj": (D, F), "up_proj": (D, F),
                                 "down_proj": (F, D)}.items():
                q, s = mk(*(k, n))
                lp[name] = {"q8": q, "scale": s}
            # interpret mode on CPU: patch the kernel call
            import functools as _ft

            orig = quant.w8a8_mlp_fused
            monkeypatch.setattr(
                quant, "w8a8_mlp_fused",
                _ft.partial(orig, block_m=16, block_k=32, interpret=True),
            )
            got = llama_mod._mlp_block(lp, None, 0.0, x)
            monkeypatch.setattr(llama_mod, "_FUSED_MLP", False)
            want = llama_mod._mlp_block(lp, None, 0.0, x)
            err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
            scale = np.abs(np.asarray(want, np.float32)).max() + 1e-6
            assert err.max() / scale < 0.05, err.max() / scale
        finally:
            quant.set_w8a8(None)
            monkeypatch.setattr(llama_mod, "_FUSED_MLP", None)
