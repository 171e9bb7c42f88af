"""Differentiable flash attention: forward + gradient parity vs jnp autodiff
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.ops.flash_attention import make_flash_mha, mha_reference


def rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), jnp.float32)


class TestFlashVjp:
    @pytest.mark.parametrize("causal", [True, False])
    def test_forward_matches_reference(self, causal):
        q, k, v = (rand((1, 256, 2, 128), s) for s in (0, 1, 2))
        f = make_flash_mha(causal=causal, interpret=True)
        out = f(q, k, v)
        ref = mha_reference(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)

    @pytest.mark.slow
    @pytest.mark.parametrize("causal", [True, False])
    def test_grads_match_reference(self, causal):
        q, k, v = (rand((1, 128, 2, 128), s) for s in (3, 4, 5))
        f = make_flash_mha(causal=causal, interpret=True)

        def loss_flash(q, k, v):
            return jnp.sum(f(q, k, v) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(mha_reference(q, k, v, causal=causal) ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gf, gr, name in zip(g_flash, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), rtol=5e-3, atol=5e-3,
                err_msg=f"d{name} mismatch",
            )

    @pytest.mark.slow
    def test_grads_with_kv_lens(self):
        q, k, v = (rand((2, 128, 2, 128), s) for s in (6, 7, 8))
        lens = jnp.array([100, 128], jnp.int32)
        f = make_flash_mha(causal=True, interpret=True)

        g_flash = jax.grad(lambda q, k, v: jnp.sum(f(q, k, v, lens) ** 2), (0, 1, 2))(q, k, v)
        g_ref = jax.grad(
            lambda q, k, v: jnp.sum(mha_reference(q, k, v, causal=True, kv_lens=lens) ** 2),
            (0, 1, 2),
        )(q, k, v)
        for gf, gr, name in zip(g_flash, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), rtol=5e-3, atol=5e-3,
                err_msg=f"d{name} mismatch",
            )
        # grads wrt padded kv rows of row 0 must be zero
        np.testing.assert_allclose(np.asarray(g_flash[1][0, 100:]), 0.0, atol=1e-6)

    @pytest.mark.slow
    def test_gqa_grads(self):
        q = rand((1, 128, 4, 128), 9)
        k, v = rand((1, 128, 2, 128), 10), rand((1, 128, 2, 128), 11)
        f = make_flash_mha(causal=True, interpret=True)
        g_flash = jax.grad(lambda q, k, v: jnp.sum(f(q, k, v) ** 2), (0, 1, 2))(q, k, v)
        g_ref = jax.grad(
            lambda q, k, v: jnp.sum(mha_reference(q, k, v, causal=True) ** 2), (0, 1, 2)
        )(q, k, v)
        for gf, gr in zip(g_flash, g_ref):
            assert gf.shape == gr.shape
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=5e-3, atol=5e-3)

    @pytest.mark.slow
    def test_unaligned_seq(self):
        q, k, v = (rand((1, 200, 2, 128), s) for s in (12, 13, 14))
        f = make_flash_mha(causal=True, interpret=True)
        out = f(q, k, v)
        ref = mha_reference(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)
        g = jax.grad(lambda q: jnp.sum(f(q, k, v) ** 2))(q)
        gr = jax.grad(lambda q: jnp.sum(mha_reference(q, k, v, causal=True) ** 2))(q)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr), rtol=5e-3, atol=5e-3)
