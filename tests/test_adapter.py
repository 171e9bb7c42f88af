"""ClipEncoder adapter tests: sine positions vs reference math, output modes,
T2V conditioning, and hierarchy window batching."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.config import AdapterConfig
from revisionllm_tpu.models.adapter import (
    clip_encoder_forward,
    init_adapter_params,
    sine_positions,
)


def np_sine_positions(mask, num_pos_feats, temperature=10000.0):
    """Independent NumPy transcription of the reference formula
    (transformer.py:35-57) used as the golden value."""
    x_embed = np.cumsum(mask, axis=1).astype(np.float64)
    eps = 1e-6
    x_embed = x_embed / (x_embed[:, -1:] + eps) * (2 * math.pi)
    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = temperature ** (2 * np.floor(dim_t / 2) / num_pos_feats)
    pos = x_embed[:, :, None] / dim_t
    out = np.stack([np.sin(pos[:, :, 0::2]), np.cos(pos[:, :, 1::2])], axis=3)
    return out.reshape(pos.shape[0], pos.shape[1], -1)


class TestSinePositions:
    def test_matches_reference_formula(self):
        mask = np.ones((2, 7), dtype=np.float32)
        got = np.asarray(sine_positions(jnp.asarray(mask), 8))
        want = np_sine_positions(mask, 8)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_full_width(self):
        mask = np.ones((1, 5), dtype=np.float32)
        got = np.asarray(sine_positions(jnp.asarray(mask), 768))
        assert got.shape == (1, 5, 768)
        want = np_sine_positions(mask, 768)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def small_cfg():
    return AdapterConfig(
        d_model=32, num_heads=4, num_layers=2, ffn_dim=64, hidden_size=48,
        clip_adapter_text=True, hierarchy=True, feature_mode="cls",
    )


class TestClipEncoder:
    def test_cls_mode_one_token(self, small_cfg):
        params = init_adapter_params(small_cfg, jax.random.PRNGKey(0))
        video = jnp.asarray(np.random.default_rng(0).normal(size=(3, 10, 32)), jnp.float32)
        text = jnp.asarray(np.random.default_rng(1).normal(size=(3, 5, 32)), jnp.float32)
        out = clip_encoder_forward(small_cfg, params, video, text)
        assert out.shape == (3, 1, 48)

    def test_temporal_mode_per_frame(self, small_cfg):
        cfg = AdapterConfig(**{**small_cfg.__dict__, "hierarchy": False, "feature_mode": "temporal"})
        params = init_adapter_params(cfg, jax.random.PRNGKey(0))
        video = jnp.ones((2, 10, 32))
        text = jnp.ones((2, 5, 32))
        out = clip_encoder_forward(cfg, params, video, text)
        assert out.shape == (2, 10, 48)

    def test_text_conditioning_changes_output(self, small_cfg):
        params = init_adapter_params(small_cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(2)
        video = jnp.asarray(rng.normal(size=(1, 8, 32)), jnp.float32)
        t1 = jnp.asarray(rng.normal(size=(1, 4, 32)), jnp.float32)
        t2 = jnp.asarray(rng.normal(size=(1, 4, 32)), jnp.float32)
        o1 = clip_encoder_forward(small_cfg, params, video, t1)
        o2 = clip_encoder_forward(small_cfg, params, video, t2)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_text_padding_masked(self, small_cfg):
        """Padded text tokens must not influence the output."""
        params = init_adapter_params(small_cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(3)
        video = jnp.asarray(rng.normal(size=(1, 8, 32)), jnp.float32)
        text = jnp.asarray(rng.normal(size=(1, 6, 32)), jnp.float32)
        valid = jnp.array([[1, 1, 1, 0, 0, 0]], dtype=bool)
        garbage = text.at[:, 3:].set(999.0)
        o1 = clip_encoder_forward(small_cfg, params, video, text, text_valid=valid)
        o2 = clip_encoder_forward(small_cfg, params, video, garbage, text_valid=valid)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-4, atol=1e-5)

    def test_hierarchy_window_batch(self, small_cfg):
        """(B·V) windows as one batch: each window compressed independently —
        permuting windows permutes outputs (the property the reference gets
        from its rearrange at vtimellm_arch.py:114-121)."""
        params = init_adapter_params(small_cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(4)
        wins = jnp.asarray(rng.normal(size=(6, 10, 32)), jnp.float32)
        text = jnp.asarray(rng.normal(size=(1, 5, 32)), jnp.float32)
        text_b = jnp.broadcast_to(text, (6, 5, 32))
        out = clip_encoder_forward(small_cfg, params, wins, text_b)
        perm = jnp.array([3, 1, 5, 0, 2, 4])
        out_perm = clip_encoder_forward(small_cfg, params, wins[perm], text_b)
        np.testing.assert_allclose(
            np.asarray(out[perm]), np.asarray(out_perm), rtol=1e-4, atol=1e-5
        )

    def test_dropout_changes_training_output(self, small_cfg):
        params = init_adapter_params(small_cfg, jax.random.PRNGKey(0))
        video = jnp.ones((1, 6, 32))
        text = jnp.ones((1, 3, 32))
        o_det = clip_encoder_forward(small_cfg, params, video, text, deterministic=True)
        o_tr = clip_encoder_forward(
            small_cfg, params, video, text, deterministic=False, rng=jax.random.PRNGKey(7)
        )
        assert not np.allclose(np.asarray(o_det), np.asarray(o_tr))
