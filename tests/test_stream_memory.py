"""Streaming-memory training tests: pooling parity and the stream loss path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.config import AdapterConfig, LlamaConfig, LoraConfig, TrainConfig
from revisionllm_tpu.constants import IMAGE_TOKEN_INDEX, MEMORY_TOKEN_INDEX, PREFIX
from revisionllm_tpu.data.stream import build_prefix_ids, build_visual_memory
from revisionllm_tpu.models import llama, revisionllm
from revisionllm_tpu.models.multimodal import build_splice_plan, stack_plans
from revisionllm_tpu.train import optimizer as opt_lib, trainer as trainer_lib

from test_dataset import FakeTokenizer


class TestVisualMemory:
    def _images(self, B=3, T=20, d=8):
        return np.random.default_rng(0).normal(size=(B, T, d)).astype(np.float32)

    def test_mean_pool(self):
        img = self._images()
        mem = build_visual_memory(
            img, np.zeros((3, 2), np.int32), np.ones(3, np.int32),
            "mean_pool", np.random.default_rng(0),
        )
        assert mem.shape == (3, 1, 8)
        np.testing.assert_allclose(mem[:, 0], img.mean(1), rtol=1e-6)

    def test_gt_mean_pool_positive_uses_gt_window(self):
        img = self._images()
        sef = np.array([[2, 5], [0, 3], [10, 15]], np.int32)
        mem = build_visual_memory(
            img, sef, np.ones(3, np.int32), "gt_mean_pool", np.random.default_rng(0)
        )
        np.testing.assert_allclose(mem[0, 0], img[0, 2:6].mean(0), rtol=1e-6)

    def test_gt_multi_shape(self):
        mem = build_visual_memory(
            self._images(), np.array([[0, 10]] * 3, np.int32),
            np.zeros(3, np.int32), "gt_multi", np.random.default_rng(0),
        )
        assert mem.shape == (3, 5, 8)

    def test_multi_pool_segments(self):
        img = self._images()
        mem = build_visual_memory(
            img, np.zeros((3, 2), np.int32), np.ones(3, np.int32),
            "multi_pool", np.random.default_rng(0),
        )
        assert mem.shape == (3, 5, 8)
        np.testing.assert_allclose(mem[0, 0], img[0, 0:4].mean(0), rtol=1e-6)

    def test_prefix_ids(self):
        tok = FakeTokenizer()
        ids = build_prefix_ids(np.array([0, 1]), tok, max_len=16)
        assert ids.shape == (2, 16)
        # different prefixes for neg/pos
        assert not np.array_equal(ids[0], ids[1])


class TestStreamLoss:
    @pytest.mark.slow
    def test_stream_step_runs(self):
        cfg = LlamaConfig.tiny()
        cfg = cfg.__class__(**{**cfg.__dict__, "dtype": "float32"})
        adapter_cfg = AdapterConfig(
            kind="mlp", d_model=16, hidden_size=cfg.hidden_size,
        )
        train_cfg = TrainConfig(
            training_stage=2, lora=LoraConfig(r=4, alpha=8),
            gradient_checkpointing=False, gradient_accumulation=1,
            stream_loss="double", memory_type="mean_pool",
        )
        base = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        vision = revisionllm.init_vision_params(adapter_cfg, jax.random.PRNGKey(1), d_in=16)
        trainable, frozen, _ = trainer_lib.build_trainable(
            cfg, train_cfg, vision, jax.random.PRNGKey(2)
        )
        optimizer = opt_lib.make_optimizer(train_cfg, 10)
        opt_state = optimizer.init(trainable)

        B, T, d = 2, 12, 16
        rng = np.random.default_rng(0)
        images = rng.normal(size=(B, T, d)).astype(np.float32)
        neg = np.array([0, 1], np.int32)
        mem = build_visual_memory(
            images, np.array([[1, 4]] * B, np.int32), neg, "mean_pool",
            np.random.default_rng(1),
        )
        tok = FakeTokenizer()
        prefix_ids = build_prefix_ids(neg, tok, max_len=16)
        P, M = prefix_ids.shape[1], mem.shape[1]

        ids1 = [1, 10, IMAGE_TOKEN_INDEX, 12, 13]
        labels1 = [-100, -100, -100, 200, 201]
        ids2 = [1, 10, IMAGE_TOKEN_INDEX, 11, MEMORY_TOKEN_INDEX, 12, 13]
        labels2 = [-100, -100, -100, -100, -100, 200, 201]
        plan1 = stack_plans([build_splice_plan(ids1, T, 48, labels=labels1)] * B)
        plan2 = stack_plans(
            [build_splice_plan(ids2, T, 64, labels=labels2, num_memory_tokens=P + M)] * B
        )
        batch = {
            **{k: jnp.asarray(v) for k, v in plan1.items()},
            "images": jnp.asarray(images),
            **{f"c2_{k}": jnp.asarray(v) for k, v in plan2.items()},
            "c2_images": jnp.asarray(images),
            "visual_memory": jnp.asarray(mem),
            "prefix_ids": jnp.asarray(prefix_ids),
        }

        step = trainer_lib.make_train_step(
            cfg, adapter_cfg, train_cfg, optimizer, stream=True
        )
        losses = []
        for i in range(3):
            trainable, opt_state, metrics = jax.jit(step)(
                trainable, frozen, base, opt_state, batch, jax.random.PRNGKey(i)
            )
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]
