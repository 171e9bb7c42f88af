"""Pallas decode-attention kernel vs jnp reference (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from revisionllm_tpu.ops.decode_attention import (
    decode_attention,
    decode_attention_reference,
)


def _rand(rng, shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


class TestDecodeAttention:
    def test_matches_reference(self):
        B, KH, group, hd, S, G = 4, 8, 1, 128, 40, 8
        rng = np.random.default_rng(0)
        q = _rand(rng, (B, KH, group, hd))
        pk, pv = _rand(rng, (B, KH, S, hd)), _rand(rng, (B, KH, S, hd))
        gk, gv = _rand(rng, (B, KH, G, hd)), _rand(rng, (B, KH, G, hd))
        lens = jnp.asarray([40, 17, 1, 33], jnp.int32)
        step = jnp.asarray(3, jnp.int32)
        got = decode_attention(q, pk, pv, gk, gv, lens, step, interpret=True)
        want = decode_attention_reference(q, pk, pv, gk, gv, lens, step)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_gqa_groups(self):
        B, KH, group, hd, S, G = 2, 2, 4, 128, 24, 4
        rng = np.random.default_rng(1)
        q = _rand(rng, (B, KH, group, hd))
        pk, pv = _rand(rng, (B, KH, S, hd)), _rand(rng, (B, KH, S, hd))
        gk, gv = _rand(rng, (B, KH, G, hd)), _rand(rng, (B, KH, G, hd))
        lens = jnp.asarray([24, 9], jnp.int32)
        got = decode_attention(q, pk, pv, gk, gv, lens, jnp.asarray(0), interpret=True)
        want = decode_attention_reference(q, pk, pv, gk, gv, lens, jnp.asarray(0))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_step_zero_ignores_future_gen_slots(self):
        """Gen slots > step must not leak even if they hold garbage."""
        B, KH, group, hd, S, G = 2, 1, 1, 128, 16, 6
        rng = np.random.default_rng(2)
        q = _rand(rng, (B, KH, group, hd))
        pk, pv = _rand(rng, (B, KH, S, hd)), _rand(rng, (B, KH, S, hd))
        gk, gv = _rand(rng, (B, KH, G, hd)), _rand(rng, (B, KH, G, hd))
        garbage = gk.at[:, :, 1:].set(1e4)
        lens = jnp.asarray([16, 7], jnp.int32)
        a = decode_attention(q, pk, pv, gk, gv, lens, jnp.asarray(0), interpret=True)
        b = decode_attention(q, pk, pv, garbage, gv, lens, jnp.asarray(0), interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
