"""CLIP encoder parity vs HF transformers CLIPModel on identical weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from revisionllm_tpu.models.clip import convert_hf_clip, encode_image, encode_text


@pytest.fixture(scope="module")
def hf_clip():
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        text_config=dict(
            vocab_size=99, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=1, max_position_embeddings=16,
            # our encode_text pools at argmax(ids) like the OpenAI/vendored CLIP
            # (reference clip/model.py:349); make HF's eos pooling coincide by
            # using the max vocab id as EOT
            eos_token_id=98,
        ),
        vision_config=dict(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=1, image_size=28, patch_size=14,
        ),
        projection_dim=32,
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    return model


class TestClipParity:
    def test_image_features_match(self, hf_clip):
        state = {k: v.numpy() for k, v in hf_clip.state_dict().items()}
        params = convert_hf_clip(state)
        # tiny config: head_dim != 64, fix num_heads from config
        params["visual"]["num_heads"] = 1
        params["text"]["num_heads"] = 1

        rng = np.random.default_rng(0)
        pixels = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
        with torch.no_grad():
            want = hf_clip.get_image_features(pixel_values=torch.from_numpy(pixels)).numpy()
        got = np.asarray(encode_image(params, jnp.asarray(pixels)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_text_features_match(self, hf_clip):
        state = {k: v.numpy() for k, v in hf_clip.state_dict().items()}
        params = convert_hf_clip(state)
        params["visual"]["num_heads"] = 1
        params["text"]["num_heads"] = 1

        ids = np.array([[49, 3, 7, 98, 0, 0], [49, 5, 98, 0, 0, 0]], dtype=np.int64)
        with torch.no_grad():
            want = hf_clip.get_text_features(input_ids=torch.from_numpy(ids)).numpy()
        out = encode_text(params, jnp.asarray(ids))
        got = np.asarray(out["pooler_output"])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
        assert out["last_hidden_state"].shape == (2, 6, 32)
