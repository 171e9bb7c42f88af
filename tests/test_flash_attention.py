"""Pallas flash attention vs jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.ops.flash_attention import flash_attention, mha_reference


def rand_qkv(rng, B, T, S, H, KH, d, dtype=jnp.float32):
    q = jnp.asarray(rng.normal(size=(B, T, H, d)), dtype=dtype)
    k = jnp.asarray(rng.normal(size=(B, S, KH, d)), dtype=dtype)
    v = jnp.asarray(rng.normal(size=(B, S, KH, d)), dtype=dtype)
    return q, k, v


class TestReference:
    def test_causal_masks_future(self):
        rng = np.random.default_rng(0)
        q, k, v = rand_qkv(rng, 1, 4, 4, 2, 2, 8)
        out = mha_reference(q, k, v, causal=True)
        # first position attends only to itself -> equals v[0]
        np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(v[0, 0]), rtol=1e-5)

    def test_kv_lens_mask(self):
        rng = np.random.default_rng(1)
        q, k, v = rand_qkv(rng, 2, 4, 8, 2, 2, 8)
        out_full = mha_reference(q, k[:, :5], v[:, :5], causal=False)
        out_masked = mha_reference(q, k, v, causal=False, kv_lens=jnp.array([5, 5]))
        np.testing.assert_allclose(
            np.asarray(out_full), np.asarray(out_masked), rtol=1e-5, atol=1e-6
        )

    def test_gqa_equivalent_to_repeat(self):
        rng = np.random.default_rng(2)
        q, k, v = rand_qkv(rng, 1, 8, 8, 4, 2, 16)
        out = mha_reference(q, k, v, causal=True)
        k_rep = jnp.repeat(k, 2, axis=2)
        v_rep = jnp.repeat(v, 2, axis=2)
        out_rep = mha_reference(q, k_rep, v_rep, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_rep), rtol=1e-5)


class TestPallasKernel:
    @pytest.mark.parametrize("causal", [True, False])
    def test_matches_reference(self, causal):
        rng = np.random.default_rng(3)
        q, k, v = rand_qkv(rng, 2, 256, 256, 2, 2, 128)
        ref = mha_reference(q, k, v, causal=causal)
        out = flash_attention(q, k, v, causal=causal, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_unaligned_seq_padding(self):
        rng = np.random.default_rng(4)
        q, k, v = rand_qkv(rng, 1, 200, 200, 2, 2, 128)
        ref = mha_reference(q, k, v, causal=True)
        out = flash_attention(q, k, v, causal=True, interpret=True, block_q=128, block_k=128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_kv_lens(self):
        rng = np.random.default_rng(5)
        q, k, v = rand_qkv(rng, 2, 128, 256, 2, 2, 128)
        lens = jnp.array([100, 256])
        ref = mha_reference(q, k, v, causal=False, kv_lens=lens)
        out = flash_attention(q, k, v, causal=False, kv_lens=lens, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_gqa(self):
        rng = np.random.default_rng(6)
        q, k, v = rand_qkv(rng, 1, 128, 128, 4, 2, 128)
        ref = mha_reference(q, k, v, causal=True)
        out = flash_attention(q, k, v, causal=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    def test_bf16(self):
        rng = np.random.default_rng(7)
        q, k, v = rand_qkv(rng, 1, 128, 128, 2, 2, 128, dtype=jnp.bfloat16)
        ref = mha_reference(q, k, v, causal=True)
        out = flash_attention(q, k, v, causal=True, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32),
            rtol=5e-2, atol=5e-2,
        )


class TestLseAndMerge:
    def test_lse_pieces_merge_to_full(self):
        """Attention over [prefix | rest] computed as two pieces and merged by
        logsumexp must equal attention over the concatenation — the identity
        the shared-prefix prefill relies on."""
        from revisionllm_tpu.ops.flash_attention import (
            attention_lse,
            merge_attention_pieces,
            mha_reference,
        )

        rng = np.random.default_rng(0)
        B, T, P, H, d = 2, 8, 5, 2, 16
        q = jnp.asarray(rng.normal(size=(B, T, H, d)), jnp.float32)
        k_pre = jnp.asarray(rng.normal(size=(B, P, H, d)), jnp.float32)
        v_pre = jnp.asarray(rng.normal(size=(B, P, H, d)), jnp.float32)
        k_new = jnp.asarray(rng.normal(size=(B, T, H, d)), jnp.float32)
        v_new = jnp.asarray(rng.normal(size=(B, T, H, d)), jnp.float32)

        o1, lse1 = attention_lse(q, k_pre, v_pre, causal=False, use_pallas=False)
        o2, lse2 = attention_lse(q, k_new, v_new, causal=True, use_pallas=False)
        merged = merge_attention_pieces(o1, lse1, o2, lse2)

        # full attention: prefix fully visible + causal over the new block
        k_full = jnp.concatenate([k_pre, k_new], axis=1)
        v_full = jnp.concatenate([v_pre, v_new], axis=1)
        s = jnp.einsum("bthd,bshd->bhts", q, k_full) / np.sqrt(d)
        row = jnp.arange(T)[:, None]
        col = jnp.arange(T)[None, :]
        causal_mask = jnp.concatenate(
            [jnp.ones((T, P), bool), row >= col], axis=1
        )
        s = jnp.where(causal_mask[None, None], s, -2e30)
        p = jax.nn.softmax(s, axis=-1)
        want = jnp.einsum("bhts,bshd->bthd", p, v_full)
        np.testing.assert_allclose(
            np.asarray(merged), np.asarray(want), rtol=2e-4, atol=2e-5
        )

    def test_pallas_lse_matches_reference(self):
        from revisionllm_tpu.ops.flash_attention import (
            flash_attention_lse,
            mha_reference_lse,
        )

        rng = np.random.default_rng(1)
        q, k, v = (jnp.asarray(rng.normal(size=(1, 256, 2, 128)), jnp.float32) for _ in range(3))
        o_p, lse_p = flash_attention_lse(q, k, v, causal=True, interpret=True)
        o_r, lse_r = mha_reference_lse(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_r), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(lse_p), np.asarray(lse_r), rtol=1e-3, atol=1e-3)


class TestPrefixedKernel:
    @pytest.mark.parametrize("P,T", [(40, 200), (128, 256)])
    def test_matches_reference(self, P, T):
        from revisionllm_tpu.ops.flash_attention import (
            flash_attention_prefixed,
            prefixed_attention_reference,
        )

        rng = np.random.default_rng(0)
        B, H, d = 2, 2, 128
        q = jnp.asarray(rng.normal(size=(B, T, H, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, T, H, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, T, H, d)), jnp.float32)
        pk = jnp.asarray(rng.normal(size=(1, P, H, d)), jnp.float32)
        pv = jnp.asarray(rng.normal(size=(1, P, H, d)), jnp.float32)

        want = prefixed_attention_reference(q, k, v, pk, pv)
        got = flash_attention_prefixed(q, k, v, pk, pv, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)

    @pytest.mark.slow
    def test_ragged_kv_lens(self):
        from revisionllm_tpu.ops.flash_attention import (
            flash_attention_prefixed,
            prefixed_attention_reference,
        )

        rng = np.random.default_rng(1)
        B, T, P, H, d = 2, 128, 44, 2, 128
        q = jnp.asarray(rng.normal(size=(B, T, H, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, T, H, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, T, H, d)), jnp.float32)
        pk = jnp.asarray(rng.normal(size=(1, P, H, d)), jnp.float32)
        pv = jnp.asarray(rng.normal(size=(1, P, H, d)), jnp.float32)
        lens = jnp.asarray([100, 128], jnp.int32)
        want = prefixed_attention_reference(q, k, v, pk, pv, kv_lens=lens)
        got = flash_attention_prefixed(q, k, v, pk, pv, kv_lens=lens, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


class TestShortSeqDispatch:
    """attention() must route big-batch short-seq calls to one-block flash
    (materialized einsum scores grow superlinearly with batch; measured
    crossover at ~1 GB/layer — BENCH_NOTES round-3 prefill follow-ups)."""

    def test_large_scores_pick_flash(self, monkeypatch):
        import revisionllm_tpu.ops.flash_attention as FA

        calls = {}

        def fake_flash(q, k, v, **kw):
            calls.update(kw)
            return mha_reference(q, k, v, causal=kw.get("causal", True),
                                 kv_lens=kw.get("kv_lens"))

        monkeypatch.setattr(FA, "flash_attention", fake_flash)
        monkeypatch.setattr(FA, "_EINSUM_SCORES_BYTES_MAX", 1)
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(2, 24, 4, 16)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, 24, 4, 16)).astype(np.float32))
        out = FA.attention(q, k, v=k, use_pallas=True)
        assert "block_q" in calls and "block_k" in calls
        assert calls["block_q"] == 24 and calls["block_k"] == 128
        ref = mha_reference(q, k, k, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)

    def test_small_scores_keep_einsum(self, monkeypatch):
        import revisionllm_tpu.ops.flash_attention as FA

        def boom(*a, **k):
            raise AssertionError("flash should not be called")

        monkeypatch.setattr(FA, "flash_attention", boom)
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(2, 24, 4, 16)).astype(np.float32))
        out = FA.attention(q, q, q, use_pallas=True)
        assert out.shape == q.shape


def test_bf16_scores_close_to_f32(monkeypatch):
    """REVISIONLLM_ATTN_BF16=1 (bf16 score/softmax einsum path) stays within
    bf16 rounding of the f32 path — the serving-noise budget that already
    admits W8A8 (~0.3%) and KV8."""
    import numpy as np

    import revisionllm_tpu.ops.flash_attention as F

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 24, 4, 16)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(2, 24, 4, 16)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(2, 24, 4, 16)), jnp.bfloat16)
    kv_lens = jnp.asarray([24, 17])

    monkeypatch.setattr(F, "_ATTN_BF16", False)
    ref = np.asarray(F.mha_reference(q, k, v, causal=True, kv_lens=kv_lens),
                     np.float32)
    monkeypatch.setattr(F, "_ATTN_BF16", True)
    out = np.asarray(F.mha_reference(q, k, v, causal=True, kv_lens=kv_lens),
                     np.float32)
    monkeypatch.setattr(F, "_ATTN_BF16", None)
    # bf16 softmax noise: ~0.4% relative on O(1) outputs
    assert np.abs(out - ref).max() < 0.05, np.abs(out - ref).max()
    assert np.abs(out - ref).mean() < 0.01
