"""Int8-frozen-base (QLoRA-style) training: a 7B base + LoRA + activations
fit one 16 GB chip only if the frozen backbone is int8. Gradients must flow
through the dequant route to LoRA/adapter params in EVERY layer, and the
stage machine's merge must handle quantized weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.config import (
    AdapterConfig, LlamaConfig, LoraConfig, TrainConfig,
)
from revisionllm_tpu.constants import IMAGE_TOKEN_INDEX
from revisionllm_tpu.models import llama, lora as lora_mod, revisionllm
from revisionllm_tpu.models.multimodal import build_splice_plan, stack_plans
from revisionllm_tpu.ops.quant import quantize_llama_params
from revisionllm_tpu.train import optimizer as opt_lib, trainer as trainer_lib


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128, num_layers=3,
        num_heads=4, num_kv_heads=4, head_dim=16, max_position_embeddings=256,
        dtype="float32",
    )
    acfg = AdapterConfig(
        kind="clip_encoder", d_model=16, num_heads=4, num_layers=2, ffn_dim=32,
        hidden_size=cfg.hidden_size, clip_adapter_text=False, hierarchy=False,
        feature_mode="temporal",
    )
    base = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qbase = quantize_llama_params(base, quantize_lm_head=False)
    vision = revisionllm.init_vision_params(acfg, jax.random.PRNGKey(1), d_in=16)
    tcfg = TrainConfig(
        training_stage=2, lora=LoraConfig(r=4, alpha=8),
        gradient_checkpointing=True, per_device_batch_size=2,
    )

    B, V, T = 2, 4, 6
    prompt = [1, 100, 101, IMAGE_TOKEN_INDEX, 102, 103]
    labels = [-100, -100, -100, -100, 200, 201]
    plans = stack_plans(
        [build_splice_plan(prompt, V, 32, labels=labels) for _ in range(B)]
    )
    rng = np.random.default_rng(0)
    batch = {
        **{k: jnp.asarray(v) for k, v in plans.items()},
        "images": jnp.asarray(rng.normal(size=(B, V, 16)), jnp.float32),
    }
    return cfg, acfg, tcfg, base, qbase, vision, batch


class TestQLora:
    @pytest.mark.slow
    def test_grads_flow_every_layer(self, setup):
        cfg, acfg, tcfg, base, qbase, vision, batch = setup
        trainable, frozen, _ = trainer_lib.build_trainable(
            cfg, tcfg, vision, jax.random.PRNGKey(2)
        )
        loss_fn = trainer_lib.make_loss_fn(cfg, acfg, tcfg)
        grads = jax.grad(
            lambda tr: loss_fn(tr, frozen, qbase, batch, jax.random.PRNGKey(3))
        )(trainable)
        la = grads["lora"]["layers"]
        # B is zero-initialized (PEFT convention) so A-grads are zero at
        # step 0 by construction; B-grads must be live in EVERY layer —
        # that requires the backward path through the int8 dequant matmuls
        for name, mats in la.items():
            g = np.asarray(mats["b"])
            for layer in range(cfg.num_layers):
                assert np.abs(g[layer]).max() > 0, f"dead grad: {name} layer {layer}"
        gv = np.concatenate([np.ravel(x) for x in jax.tree.leaves(grads["vision"])])
        assert np.isfinite(gv).all() and np.abs(gv).max() > 0

        # after one SGD-ish update B is nonzero, so A-grads must come alive
        upd = jax.tree.map(lambda p, g: p - 0.1 * g, trainable, grads)
        grads2 = jax.grad(
            lambda tr: loss_fn(tr, frozen, qbase, batch, jax.random.PRNGKey(4))
        )(upd)
        ga2 = np.asarray(grads2["lora"]["layers"]["down_proj"]["a"])
        assert np.abs(ga2).max() > 0

    @pytest.mark.slow
    def test_loss_close_to_bf16_base(self, setup):
        cfg, acfg, tcfg, base, qbase, vision, batch = setup
        trainable, frozen, _ = trainer_lib.build_trainable(
            cfg, tcfg, vision, jax.random.PRNGKey(2)
        )
        loss_fn = trainer_lib.make_loss_fn(cfg, acfg, tcfg)
        lf = float(loss_fn(trainable, frozen, base, batch, jax.random.PRNGKey(3)))
        lq = float(loss_fn(trainable, frozen, qbase, batch, jax.random.PRNGKey(3)))
        assert abs(lf - lq) / max(abs(lf), 1e-6) < 0.05

    @pytest.mark.slow
    def test_training_reduces_loss(self, setup):
        cfg, acfg, tcfg, base, qbase, vision, batch = setup
        trainable, frozen, _ = trainer_lib.build_trainable(
            cfg, tcfg, vision, jax.random.PRNGKey(2)
        )
        optimizer = opt_lib.make_optimizer(tcfg, total_steps=20)
        opt_state = optimizer.init(trainable)
        step = jax.jit(
            trainer_lib.make_train_step(cfg, acfg, tcfg, optimizer)
        )
        losses = []
        for i in range(8):
            trainable, opt_state, metrics = step(
                trainable, frozen, qbase, opt_state, batch, jax.random.PRNGKey(i)
            )
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses

    def test_merge_into_quantized_base(self, setup):
        cfg, acfg, tcfg, base, qbase, vision, batch = setup
        lcfg = tcfg.lora
        lora_tree = lora_mod.init_lora(cfg, lcfg, jax.random.PRNGKey(9))
        # make the delta non-trivial
        lora_tree = jax.tree.map(lambda x: x + 0.05, lora_tree)
        merged_q = lora_mod.merge(qbase, lora_tree, lcfg)
        merged_f = lora_mod.merge(base, lora_tree, lcfg)
        for name in ("q_proj", "down_proj"):
            wq = merged_q["layers"][name]
            assert "q8" in wq  # stays quantized
            from revisionllm_tpu.ops.quant import dequantize_int8

            deq = np.asarray(dequantize_int8(wq["q8"], wq["scale"], jnp.float32))
            ref = np.asarray(merged_f["layers"][name])
            # within combined quantization noise of the two roundtrips
            tol = 2.1 * np.abs(ref).max(axis=-2, keepdims=True) / 127.0
            assert (np.abs(deq - ref) <= tol + 1e-6).all()


class TestExactTraceGuard:
    def test_small_m_grad_with_tpu_dispatch(self, monkeypatch):
        """Round-5 regression: on a TPU backend a SMALL-M q8_apply call
        (M <= pallas_max_m, e.g. stage-3 hierarchy sequences of ~256 tokens)
        dispatches to the Pallas int8_matmul, which has no JVP rule —
        jax.grad through it raised inside pallas_call's jvp rule. The
        trainer's _dequant_trace must force the exact dequant route for
        DEFAULT-dispatch calls while tracing (explicit use_pallas=True
        still reaches the kernel for parity tests)."""
        from revisionllm_tpu.ops import quant

        monkeypatch.setattr(quant, "_is_tpu_backend", lambda: True)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 32)), jnp.float32)  # M=4 << 256
        q8, scale = quant.quantize_int8(
            jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
        )
        w = {"q8": q8, "scale": scale}

        def loss(x):
            return quant.q8_apply(x, w).sum()

        with trainer_lib._dequant_trace():
            g = jax.grad(loss)(x)  # raised AssertionError before the guard
        expected = jax.grad(
            lambda x: (x @ quant.dequantize_int8(w["q8"], w["scale"], x.dtype)).sum()
        )(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(expected), rtol=1e-6)
        # guard restored: default dispatch resolves to the kernel path again
        assert quant._EXACT_TRACE is False
