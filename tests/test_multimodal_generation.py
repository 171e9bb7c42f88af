"""Splice-plan layout, end-to-end generation, LM loss, and LoRA tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.config import AdapterConfig, LlamaConfig, LoraConfig
from revisionllm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX, MEMORY_TOKEN_INDEX
from revisionllm_tpu.models import generation, llama, lora as lora_mod, revisionllm
from revisionllm_tpu.models.multimodal import (
    KIND_MEMORY,
    KIND_TEXT,
    KIND_VIDEO,
    build_splice_plan,
    splice_embeds,
    stack_plans,
)


class TestSplicePlan:
    def test_layout(self):
        ids = [1, 10, 11, IMAGE_TOKEN_INDEX, 12, 13]
        plan = build_splice_plan(ids, num_video_tokens=4, max_len=16)
        assert plan.length == 3 + 4 + 2
        assert list(plan.kind[:3]) == [KIND_TEXT] * 3
        assert list(plan.kind[3:7]) == [KIND_VIDEO] * 4
        assert list(plan.src_idx[3:7]) == [0, 1, 2, 3]
        assert list(plan.kind[7:9]) == [KIND_TEXT] * 2
        assert list(plan.text_ids[7:9]) == [12, 13]
        assert list(plan.positions[: plan.length]) == list(range(9))

    def test_labels_ignored_on_video(self):
        ids = [1, 10, IMAGE_TOKEN_INDEX, 12]
        labels = [IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 12]
        plan = build_splice_plan(ids, 3, 16, labels=labels)
        assert all(l == IGNORE_INDEX for l in plan.labels[:5])
        assert plan.labels[5] == 12

    def test_memory_segment(self):
        ids = [1, 10, IMAGE_TOKEN_INDEX, 11, MEMORY_TOKEN_INDEX, 12]
        plan = build_splice_plan(ids, 2, 16, num_memory_tokens=3)
        kinds = list(plan.kind[: plan.length])
        assert kinds == [KIND_TEXT] * 2 + [KIND_VIDEO] * 2 + [KIND_TEXT] + [KIND_MEMORY] * 3 + [KIND_TEXT]

    def test_truncation(self):
        ids = [1, IMAGE_TOKEN_INDEX, 5]
        plan = build_splice_plan(ids, 10, max_len=6)
        assert plan.length == 6
        assert plan.num_video_tokens == 5

    def test_splice_embeds_selects_sources(self):
        ids = [1, 7, IMAGE_TOKEN_INDEX, 8]
        plan = build_splice_plan(ids, 2, 8)
        batch = stack_plans([plan])
        D = 4
        text_embeds = jnp.zeros((1, 8, D))
        video = jnp.arange(2 * D, dtype=jnp.float32).reshape(1, 2, D) + 100
        out = splice_embeds(
            text_embeds, jnp.asarray(batch["kind"]), jnp.asarray(batch["src_idx"]), video
        )
        np.testing.assert_allclose(np.asarray(out[0, 2]), np.asarray(video[0, 0]))
        np.testing.assert_allclose(np.asarray(out[0, 3]), np.asarray(video[0, 1]))
        np.testing.assert_allclose(np.asarray(out[0, 0]), 0.0)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = LlamaConfig.tiny()
    cfg = cfg.__class__(**{**cfg.__dict__, "dtype": "float32"})
    adapter_cfg = AdapterConfig(
        d_model=16, num_heads=4, num_layers=2, ffn_dim=32,
        hidden_size=cfg.hidden_size, clip_adapter_text=True, hierarchy=True,
        feature_mode="cls",
    )
    key = jax.random.PRNGKey(0)
    params = llama.init_params(cfg, key, jnp.float32)
    vision = revisionllm.init_vision_params(adapter_cfg, jax.random.PRNGKey(1), d_in=16)
    return cfg, adapter_cfg, params, vision


class TestGeneration:
    def test_generate_matches_stepwise_greedy(self, tiny_model):
        """The scan decode must reproduce naive greedy decoding."""
        cfg, _, params, _ = tiny_model
        B, P, G = 2, 6, 5
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(2, cfg.vocab_size, size=(B, P)))
        embeds = llama.embed_tokens(params, ids)
        pos = jnp.broadcast_to(jnp.arange(P), (B, P))
        lens = jnp.full((B,), P, dtype=jnp.int32)

        out = generation.generate(
            cfg, params, embeds, pos, lens, eos_id=2, max_new_tokens=G
        )

        # naive loop: full forward each time
        cur = np.asarray(ids)
        for g in range(G):
            T = cur.shape[1]
            h = llama.forward_hidden(
                cfg, params, llama.embed_tokens(params, jnp.asarray(cur)),
                jnp.broadcast_to(jnp.arange(T), (B, T)),
            )
            lg = llama.logits_from_hidden(params, h)[:, -1]
            nxt = np.asarray(jnp.argmax(lg, -1))
            want = np.asarray(out["tokens"][:, g])
            got_valid = np.asarray(out["valid"][:, g])
            for b in range(B):
                if got_valid[b]:
                    assert want[b] == nxt[b], f"step {g} row {b}"
            cur = np.concatenate([cur, nxt[:, None]], axis=1)

    def test_eos_marks_done(self, tiny_model):
        cfg, _, params, _ = tiny_model
        B, P, G = 1, 4, 8
        ids = jnp.asarray([[5, 6, 7, 8]])
        embeds = llama.embed_tokens(params, ids)
        pos = jnp.arange(P)[None]
        lens = jnp.array([P], dtype=jnp.int32)
        out = generation.generate(cfg, params, embeds, pos, lens, eos_id=2, max_new_tokens=G)
        toks = np.asarray(out["tokens"][0])
        valid = np.asarray(out["valid"][0])
        if 2 in toks.tolist():
            i = toks.tolist().index(2)
            assert valid[: i + 1].all()
            assert not valid[i + 1 :].any() or i == G - 1

    @pytest.mark.slow
    def test_full_pipeline_hierarchy(self, tiny_model):
        """Windows -> adapter CLS -> splice -> decode, shapes end to end."""
        cfg, adapter_cfg, params, vision = tiny_model
        V, T = 5, 6
        rng = np.random.default_rng(1)
        images = jnp.asarray(rng.normal(size=(1, V, T, 16)), jnp.float32)
        qf = jnp.asarray(rng.normal(size=(1, 3, 16)), jnp.float32)

        ids = [1, 10, 11, IMAGE_TOKEN_INDEX, 12, 13]
        plan = stack_plans([build_splice_plan(ids, V, 32)])
        plan = {k: jnp.asarray(v) for k, v in plan.items()}

        out = revisionllm.generate_grounding(
            cfg, adapter_cfg, params, vision, plan, images, qf,
            eos_id=2, max_new_tokens=4,
        )
        assert out["tokens"].shape == (1, 4)
        assert out["entropy_stats"].shape == (1, 4)

    def test_entropy_stats_match_module(self, tiny_model):
        from revisionllm_tpu.eval.uncertainty import entropy_statistics

        rng = np.random.default_rng(2)
        ent = jnp.asarray(rng.uniform(1, 3, size=(2, 6)), jnp.float32)
        valid = jnp.ones((2, 6), dtype=bool)
        got = np.asarray(generation.entropy_stats_from_steps(ent, valid))
        assert got.shape == (2, 4)
        np.testing.assert_allclose(got[:, 2], np.asarray(ent).mean(1), rtol=1e-5)


class TestLoss:
    def test_perfect_prediction_low_loss(self, tiny_model):
        cfg, _, params, _ = tiny_model
        logits = jnp.full((1, 4, cfg.vocab_size), -20.0)
        labels = jnp.array([[IGNORE_INDEX, 5, 6, 7]])
        logits = logits.at[0, 0, 5].set(20.0).at[0, 1, 6].set(20.0).at[0, 2, 7].set(20.0)
        loss = revisionllm.lm_loss(logits, labels)
        assert float(loss) < 1e-3

    def test_ignore_positions_excluded(self, tiny_model):
        cfg, _, params, _ = tiny_model
        rng = np.random.default_rng(3)
        logits = jnp.asarray(rng.normal(size=(1, 4, cfg.vocab_size)), jnp.float32)
        all_ignored = jnp.full((1, 4), IGNORE_INDEX)
        loss = revisionllm.lm_loss(logits, all_ignored)
        assert float(loss) == 0.0


class TestLora:
    def test_init_is_identity(self, tiny_model):
        cfg, _, params, _ = tiny_model
        lcfg = LoraConfig(r=4, alpha=8)
        l = lora_mod.init_lora(cfg, lcfg, jax.random.PRNGKey(0))
        ids = jnp.arange(8)[None]
        pos = jnp.arange(8)[None]
        e = llama.embed_tokens(params, ids)
        h0 = llama.forward_hidden(cfg, params, e, pos)
        h1 = llama.forward_hidden(
            cfg, params, e, pos, lora=l, lora_scale=lora_mod.lora_scale(lcfg)
        )
        np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), rtol=1e-6)

    def test_merge_equals_inline(self, tiny_model):
        cfg, _, params, _ = tiny_model
        lcfg = LoraConfig(r=4, alpha=8)
        l = lora_mod.init_lora(cfg, lcfg, jax.random.PRNGKey(0))
        # give B nonzero values so the adapter does something
        l = jax.tree.map(lambda x: x + 0.01, l)
        ids = jnp.arange(8)[None]
        pos = jnp.arange(8)[None]
        e = llama.embed_tokens(params, ids)
        h_inline = llama.forward_hidden(
            cfg, params, e, pos, lora=l, lora_scale=lora_mod.lora_scale(lcfg)
        )
        merged = lora_mod.merge(params, l, lcfg)
        h_merged = llama.forward_hidden(cfg, merged, e, pos)
        np.testing.assert_allclose(
            np.asarray(h_inline), np.asarray(h_merged), rtol=1e-4, atol=1e-5
        )
