"""Mesh sharding + sharded train step tests on the 8-device virtual CPU mesh
(SURVEY.md §4: xla_force_host_platform_device_count as the multi-chip
stand-in)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.config import AdapterConfig, LlamaConfig, LoraConfig, TrainConfig
from revisionllm_tpu.constants import IMAGE_TOKEN_INDEX
from revisionllm_tpu.models import llama, revisionllm
from revisionllm_tpu.models.multimodal import build_splice_plan, stack_plans
from revisionllm_tpu.parallel import mesh as mesh_lib
from revisionllm_tpu.parallel import sharding as shard_lib
from revisionllm_tpu.train import optimizer as opt_lib
from revisionllm_tpu.train import trainer as trainer_lib


@pytest.fixture(scope="module")
def tiny():
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=32, dtype="float32",
    )
    adapter_cfg = AdapterConfig(
        d_model=32, num_heads=4, num_layers=2, ffn_dim=64,
        hidden_size=cfg.hidden_size, clip_adapter_text=True, hierarchy=True,
        feature_mode="cls",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    vision = revisionllm.init_vision_params(adapter_cfg, jax.random.PRNGKey(1), d_in=32)
    return cfg, adapter_cfg, params, vision


def _make_batch(B, V=4, T=6, L=48, d=32):
    prompt = [1, 100, 101, IMAGE_TOKEN_INDEX, 102, 103, 104]
    labels = [-100, -100, -100, -100, 200, 201, 202]
    plans = stack_plans([build_splice_plan(prompt, V, L, labels=labels)] * B)
    rng = np.random.default_rng(0)
    return {
        **{k: jnp.asarray(v) for k, v in plans.items()},
        "images": jnp.asarray(rng.normal(size=(B, V, T, d)), jnp.float32),
        "query_feats": jnp.asarray(rng.normal(size=(B, 5, d)), jnp.float32),
        "query_valid": jnp.ones((B, 5), dtype=bool),
    }


class TestMesh:
    def test_mesh_axes(self):
        mesh = mesh_lib.create_mesh(2, 2, 2)
        assert mesh.axis_names == ("data", "fsdp", "tensor")
        assert mesh.devices.shape == (2, 2, 2)

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            mesh_lib.create_mesh(8, 8, 8)

    def test_param_sharding_divides(self, tiny):
        cfg, _, params, _ = tiny
        mesh = mesh_lib.create_mesh(2, 2, 2)
        specs = shard_lib.llama_param_specs(params)
        sharded = shard_lib.shard_params(mesh, params, specs)
        # column-parallel q_proj sharded over (fsdp, tensor) on dims 1, 2
        shard_shape = sharded["layers"]["q_proj"].sharding.shard_shape(
            sharded["layers"]["q_proj"].shape
        )
        assert shard_shape == (2, 128 // 2, 128 // 2)

    def test_forward_matches_unsharded(self, tiny):
        """FSDP/TP sharding must not change the math."""
        cfg, _, params, _ = tiny
        mesh = mesh_lib.create_mesh(2, 2, 2)
        ids = jnp.arange(16)[None] % cfg.vocab_size
        pos = jnp.arange(16)[None]
        e = llama.embed_tokens(params, ids)
        want = llama.forward_hidden(cfg, params, e, pos)

        specs = shard_lib.llama_param_specs(params)
        sharded = shard_lib.shard_params(mesh, params, specs)
        with mesh:
            got = jax.jit(lambda p: llama.forward_hidden(cfg, p, e, pos))(sharded)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=1e-4, atol=1e-5)


class TestTrainStep:
    @pytest.mark.slow
    def test_sharded_step_runs_and_decreases_loss(self, tiny):
        cfg, adapter_cfg, params, vision = tiny
        # the sharded step DONATES its trainable; keep the module-scoped
        # fixture's arrays alive for later tests
        vision = jax.tree.map(jnp.array, vision)
        mesh = mesh_lib.create_mesh(2, 2, 2)
        train_cfg = TrainConfig(
            training_stage=2, lora=LoraConfig(r=4, alpha=8),
            gradient_checkpointing=True, gradient_accumulation=1,
            learning_rate=1e-3,
        )
        trainable, frozen, _ = trainer_lib.build_trainable(
            cfg, train_cfg, vision, jax.random.PRNGKey(2)
        )
        optimizer = opt_lib.make_optimizer(train_cfg, total_steps=50)
        opt_state = optimizer.init(trainable)

        specs = shard_lib.llama_param_specs(params)
        base = shard_lib.shard_params(mesh, params, specs)
        batch = _make_batch(B=4)
        step = trainer_lib.make_sharded_train_step(
            cfg, adapter_cfg, train_cfg, optimizer, mesh
        )
        losses = []
        with mesh:
            for i in range(3):
                trainable, opt_state, metrics = step(
                    trainable, frozen, base, opt_state, batch, jax.random.PRNGKey(i)
                )
                losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]  # memorizing one batch must reduce loss

    def test_stage_machine(self, tiny):
        cfg, _, _, vision = tiny
        lora_prior = {"layers": {"q_proj": {"a": jnp.zeros((2, 128, 4)), "b": jnp.zeros((2, 4, 128))}}}

        # stage 1: prior LoRA frozen, adapter trainable
        t, f, _ = trainer_lib.build_trainable(
            cfg,
            TrainConfig(training_stage=1, tune_mm_mlp_adapter=True, lora=LoraConfig(r=4)),
            vision, jax.random.PRNGKey(0), prior_lora=lora_prior,
        )
        assert "vision" in t and "lora" not in t and "lora" in f

        # stage 2: fresh LoRA trainable
        t, f, _ = trainer_lib.build_trainable(
            cfg, TrainConfig(training_stage=2, lora=LoraConfig(r=4)),
            vision, jax.random.PRNGKey(0),
        )
        assert "lora" in t and "vision" in t

        # stage 4: prior LoRA continues training
        t, f, _ = trainer_lib.build_trainable(
            cfg, TrainConfig(training_stage=4, lora=LoraConfig(r=4)),
            vision, jax.random.PRNGKey(0), prior_lora=lora_prior,
        )
        assert t["lora"] is lora_prior


class TestShardedServing:
    def test_sharded_generate_matches_single_device(self, tiny):
        """Generation over a (data, fsdp, tensor) mesh must produce the same
        greedy tokens as the single-device path."""
        cfg, _, params, _ = tiny
        from revisionllm_tpu.models import generation, llama
        from revisionllm_tpu.parallel import serve

        B, P, G = 4, 6, 5
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, P)))
        embeds = llama.embed_tokens(params, ids)
        pos = jnp.broadcast_to(jnp.arange(P), (B, P))
        lens = jnp.full((B,), P, jnp.int32)

        want = generation.generate(cfg, params, embeds, pos, lens, eos_id=2, max_new_tokens=G)

        mesh = mesh_lib.create_mesh(2, 2, 2)
        sharded = serve.shard_params_for_inference(mesh, params)
        gen = serve.make_sharded_generate(cfg, mesh, eos_id=2, max_new_tokens=G)
        with mesh:
            got = gen(sharded, embeds, pos, lens)
        np.testing.assert_array_equal(
            np.asarray(want["tokens"]), np.asarray(got["tokens"])
        )

    def test_sharded_generate_quantized(self, tiny):
        cfg, _, params, _ = tiny
        from revisionllm_tpu.models import generation, llama
        from revisionllm_tpu.ops.quant import quantize_llama_params
        from revisionllm_tpu.parallel import serve

        qparams = quantize_llama_params(params)
        B, P, G = 4, 5, 3
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, P)))
        embeds = llama.embed_tokens(qparams, ids)
        pos = jnp.broadcast_to(jnp.arange(P), (B, P))
        lens = jnp.full((B,), P, jnp.int32)
        want = generation.generate(cfg, qparams, embeds, pos, lens, eos_id=2, max_new_tokens=G)

        mesh = mesh_lib.create_mesh(2, 2, 2)
        sharded = serve.shard_params_for_inference(mesh, qparams)
        gen = serve.make_sharded_generate(cfg, mesh, eos_id=2, max_new_tokens=G)
        with mesh:
            got = gen(sharded, embeds, pos, lens)
        np.testing.assert_array_equal(
            np.asarray(want["tokens"]), np.asarray(got["tokens"])
        )


class TestShardedQLora:
    @pytest.mark.slow
    def test_sharded_step_with_int8_base(self, tiny):
        """The (data, fsdp, tensor)-sharded train step with an int8-quantized
        frozen base: quantized-leaf PartitionSpecs + the forced-dequant loss
        must compose under pjit on the virtual 2x2x2 mesh."""
        from revisionllm_tpu.ops.quant import quantize_llama_params

        cfg, adapter_cfg, params, vision = tiny
        # the earlier sharded-step test DONATES its trainable (which holds
        # the fixture's vision arrays); work on fresh copies
        vision = jax.tree.map(jnp.array, vision)
        qbase = quantize_llama_params(params, quantize_lm_head=False)
        mesh = mesh_lib.create_mesh(2, 2, 2)
        train_cfg = TrainConfig(
            training_stage=2, lora=LoraConfig(r=4, alpha=8),
            gradient_checkpointing=True, gradient_accumulation=1,
            learning_rate=1e-3,
        )
        trainable, frozen, _ = trainer_lib.build_trainable(
            cfg, train_cfg, vision, jax.random.PRNGKey(2)
        )
        optimizer = opt_lib.make_optimizer(train_cfg, total_steps=50)
        opt_state = optimizer.init(trainable)

        specs = shard_lib.llama_param_specs(qbase)
        assert specs["layers"]["q_proj"]["q8"] is not None
        base = shard_lib.shard_params(mesh, qbase, specs)
        batch = _make_batch(B=4)
        step = trainer_lib.make_sharded_train_step(
            cfg, adapter_cfg, train_cfg, optimizer, mesh
        )
        losses = []
        with mesh:
            for i in range(3):
                trainable, opt_state, metrics = step(
                    trainable, frozen, base, opt_state, batch, jax.random.PRNGKey(i)
                )
                losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]


class TestMeshServingEngine:
    def test_engine_token_parity_on_mesh(self, tiny):
        """GroundingEngine(mesh=...) must produce the SAME answers as the
        unsharded engine — the multi-chip serving integration (SURVEY §2.6,
        replacing the reference's 16 independent SLURM jobs)."""
        from revisionllm_tpu.config import EvalConfig
        from revisionllm_tpu.eval.engine import GroundingEngine
        from revisionllm_tpu.utils.testing import FakeTokenizer

        cfg, adapter_cfg, params, vision = tiny
        import dataclasses

        acfg = dataclasses.replace(
            adapter_cfg, hierarchy=False, feature_mode="temporal"
        )
        ecfg = EvalConfig(
            debug_window=20, num_frames=16, feature_fps=2.0, batch=8, stride=2,
            max_new_tokens=4,
        )
        tok = FakeTokenizer()
        for i in range(300):
            tok._id(str(i))
        feats = np.random.default_rng(3).normal(size=(200, 32)).astype(np.float32)

        plain = GroundingEngine(cfg, acfg, params, vision, tok, ecfg)
        ref = plain.ground_windows(feats, "a red car")

        mesh = mesh_lib.create_mesh(2, 2, 2)
        sharded = GroundingEngine(
            cfg, acfg, params, vision, tok, ecfg, mesh=mesh
        )
        with mesh:
            got = sharded.ground_windows(feats, "a red car")
        assert got["answers"] == ref["answers"]
