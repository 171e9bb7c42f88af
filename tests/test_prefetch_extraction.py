"""Prefetcher and feature-extraction pipeline tests."""

import numpy as np
import pytest

from revisionllm_tpu.data.feature_extraction import (
    ClipFeatureExtractor,
    extract_text_features,
    linspace_sample,
    preprocess_frames,
)
from revisionllm_tpu.data.feature_store import RvfsStore
from revisionllm_tpu.data.prefetcher import DevicePrefetcher, prefetch_map


class TestPrefetcher:
    def test_device_prefetch_order(self):
        import jax.numpy as jnp

        batches = [{"x": np.full((4,), i, np.float32)} for i in range(5)]
        out = list(DevicePrefetcher(batches, size=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            assert float(b["x"][0]) == i

    def test_prefetch_map(self):
        got = list(prefetch_map(lambda x: x * 2, range(10), size=3))
        assert got == [x * 2 for x in range(10)]

    def test_error_propagates(self):
        def bad(x):
            if x == 3:
                raise ValueError("boom")
            return x

        with pytest.raises(ValueError):
            list(prefetch_map(bad, range(5)))


class TestPreprocess:
    def test_normalize_shape(self):
        frames = np.random.default_rng(0).integers(0, 255, (4, 28, 28, 3)).astype(np.uint8)
        x = preprocess_frames(frames)
        assert x.shape == (4, 3, 28, 28)
        assert x.dtype == np.float32
        assert abs(x.mean()) < 3.0

    def test_linspace_sample(self):
        frames = np.arange(100)[:, None]
        out = linspace_sample(frames, 10)
        assert out.shape == (10, 1)
        assert out[0, 0] == 0 and out[-1, 0] == 99


@pytest.fixture(scope="module")
def tiny_clip():
    torch = pytest.importorskip("torch")
    from transformers import CLIPConfig, CLIPModel

    from revisionllm_tpu.models.clip import convert_hf_clip

    cfg = CLIPConfig(
        text_config=dict(
            vocab_size=99, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=1,
            max_position_embeddings=16, eos_token_id=98,
        ),
        vision_config=dict(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=1, image_size=28, patch_size=14,
        ),
        projection_dim=32,
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    params = convert_hf_clip({k: v.numpy() for k, v in model.state_dict().items()})
    params["visual"]["num_heads"] = 1
    params["text"]["num_heads"] = 1
    return params


class TestExtraction:
    def test_image_batching_pads_tail(self, tiny_clip):
        ex = ClipFeatureExtractor(tiny_clip, batch_size=4)
        pixels = np.random.default_rng(1).normal(size=(6, 3, 28, 28)).astype(np.float32)
        feats = ex.encode_images(pixels)
        assert feats.shape == (6, 32)
        # tail chunk result must equal unbatched encode
        feats_all = ex.encode_images(pixels[:4])
        np.testing.assert_allclose(feats[:4], feats_all, rtol=1e-4, atol=1e-5)

    def test_text_store_roundtrip(self, tiny_clip, tmp_path):
        ex = ClipFeatureExtractor(tiny_clip, batch_size=4)

        def tokenize(texts):
            # toy tokenizer: ids then EOT(98), padded
            out = np.zeros((len(texts), 8), np.int64)
            for i, t in enumerate(texts):
                ids = [min(ord(c) % 90 + 3, 97) for c in t[:6]]
                out[i, : len(ids)] = ids
                out[i, len(ids)] = 98
            return out

        queries = {"q1": "hello", "q2": "a dog"}
        out_path = str(tmp_path / "text.rvfs")
        n = extract_text_features(ex, queries, tokenize, out_path)
        assert n == 2
        store = RvfsStore(out_path)
        rec = store.get_record("q1")
        assert rec["cls_features"].shape == (32,)
        # trimmed at EOT inclusive
        assert rec["token_features"].shape[0] == 6
