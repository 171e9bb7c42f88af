"""Golden tests for entropy statistics and CLIP-space pooling vs NumPy math."""

import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.eval.similarity import (
    attention_pooling,
    l2_normalize,
    proposal_cosine_scores,
    span_cxw_to_xx,
    topk_pooling,
)
from revisionllm_tpu.eval.uncertainty import entropy_statistics, token_entropy


def np_entropy(logits):
    x = logits - logits.max(-1, keepdims=True)
    p = np.exp(x) / np.exp(x).sum(-1, keepdims=True)
    return -(p * np.log(p + 1e-10)).sum(-1)


class TestEntropy:
    def test_token_entropy_matches_numpy(self):
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(2, 5, 32)).astype(np.float32)
        got = np.asarray(token_entropy(jnp.asarray(logits)))
        np.testing.assert_allclose(got, np_entropy(logits), rtol=1e-5)

    def test_uniform_logits_max_entropy(self):
        v = 64
        ent = np.asarray(token_entropy(jnp.zeros((1, 1, v))))
        assert ent[0, 0] == pytest.approx(np.log(v), rel=1e-4)

    def test_statistics_order(self):
        rng = np.random.default_rng(1)
        logits = rng.normal(size=(3, 7, 50)).astype(np.float32)
        stats = np.asarray(entropy_statistics(jnp.asarray(logits)))
        ent = np_entropy(logits)
        np.testing.assert_allclose(stats[:, 0], ent.max(1), rtol=1e-5)
        np.testing.assert_allclose(stats[:, 1], ent.min(1), rtol=1e-5)
        np.testing.assert_allclose(stats[:, 2], ent.mean(1), rtol=1e-5)
        np.testing.assert_allclose(stats[:, 3], ent.std(1, ddof=1), rtol=1e-4)

    def test_masked_statistics(self):
        rng = np.random.default_rng(2)
        logits = rng.normal(size=(1, 6, 40)).astype(np.float32)
        mask = np.array([[1, 1, 1, 0, 0, 0]], dtype=bool)
        stats = np.asarray(entropy_statistics(jnp.asarray(logits), jnp.asarray(mask)))
        ent = np_entropy(logits)[0, :3]
        assert stats[0, 0] == pytest.approx(ent.max(), rel=1e-5)
        assert stats[0, 2] == pytest.approx(ent.mean(), rel=1e-5)

    def test_single_step_std_zero(self):
        logits = jnp.ones((2, 1, 10))
        stats = np.asarray(entropy_statistics(logits))
        np.testing.assert_allclose(stats[:, 3], 0.0)


class TestSimilarity:
    def test_span_conversion(self):
        spans = jnp.array([[0.5, 1.0], [0.3, 0.2]])
        out = np.asarray(span_cxw_to_xx(spans))
        np.testing.assert_allclose(out, [[0.0, 1.0], [0.2, 0.4]], atol=1e-6)

    def test_topk_pooling_sums_top_frames(self):
        # 1 video, 4 frames, 1 text: frames 0 and 2 most similar
        text = jnp.array([[1.0, 0.0]])
        video = jnp.array([[[2.0, 0.0], [0.0, 5.0], [1.0, 0.0], [-3.0, 0.0]]])
        pooled = np.asarray(topk_pooling(text, video, k=2))
        np.testing.assert_allclose(pooled[0, 0], [3.0, 0.0])

    def test_attention_pooling_limits(self):
        text = jnp.array([[1.0, 0.0]])
        video = jnp.array([[[2.0, 0.0], [0.0, 1.0]]])
        # tiny temperature -> hard selection of best frame
        pooled = np.asarray(attention_pooling(text, video, temperature=1e-4))
        np.testing.assert_allclose(pooled[0, 0], [2.0, 0.0], atol=1e-4)

    def test_proposal_score_range(self):
        rng = np.random.default_rng(3)
        q = l2_normalize(jnp.asarray(rng.normal(size=(16,)).astype(np.float32)))
        frames = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
        valid = jnp.ones((8,), dtype=bool)
        score = float(proposal_cosine_scores(q, frames, valid, k=3))
        assert -3.0 <= score <= 3.0  # sum of 3 unit-norm cosines

    def test_proposal_score_ignores_invalid(self):
        q = jnp.array([1.0, 0.0])
        frames = jnp.array([[1.0, 0.0], [1.0, 0.0], [1.0, 0.0], [1.0, 0.0]])
        valid = jnp.array([True, False, False, False])
        score = float(proposal_cosine_scores(q, frames, valid, k=3))
        assert score == pytest.approx(1.0, rel=1e-5)

    @pytest.mark.parametrize("n_frames", [1, 2, 3, 8])
    def test_exact_cosine_quirk_matches_reference_math(self, n_frames, monkeypatch):
        """REVISIONLLM_EXACT_COSINE=1 reproduces eval_nlq_negative.py:311-314:
        per-feature norm(dim=0) across frames, top-min(n,3) pool (sum), dot
        with the query — on the zero-padded fixed-shape inputs the engine
        feeds. The default (per-frame norm) must differ for n>1."""
        rng = np.random.default_rng(17)
        d, max_len = 12, 8
        qv = rng.normal(size=(d,)).astype(np.float32)
        qv /= np.linalg.norm(qv)
        fr = np.zeros((max_len, d), np.float32)
        fr[:n_frames] = rng.normal(size=(n_frames, d)).astype(np.float32)
        valid = np.arange(max_len) < n_frames

        # reference transcription on the unpadded slice
        prop = fr[:n_frames]
        normed = prop / np.linalg.norm(prop, axis=0, keepdims=True)
        sims = normed @ qv
        k = min(n_frames, 3)
        top = np.sort(np.argsort(-sims)[:k])
        want = float(normed[top].sum(axis=0) @ qv)

        monkeypatch.setenv("REVISIONLLM_EXACT_COSINE", "1")
        got = float(proposal_cosine_scores(
            jnp.asarray(qv), jnp.asarray(fr), jnp.asarray(valid), k=3))
        assert got == pytest.approx(want, rel=1e-5, abs=1e-6)

        monkeypatch.delenv("REVISIONLLM_EXACT_COSINE")
        default = float(proposal_cosine_scores(
            jnp.asarray(qv), jnp.asarray(fr), jnp.asarray(valid), k=3))
        if n_frames > 1:
            assert default != pytest.approx(want, rel=1e-5)
