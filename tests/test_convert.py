"""Checkpoint-conversion parity: HF torch forward vs our JAX forward on the
same weights — the test that makes converted Vicuna checkpoints trustworthy."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from revisionllm_tpu.config import AdapterConfig, LlamaConfig
from revisionllm_tpu.models import llama
from revisionllm_tpu.models.adapter import _encoder_layer_post, sine_positions
from revisionllm_tpu.models.convert import (
    _convert_mha_layer,
    convert_llama,
    convert_peft_lora,
)


@pytest.fixture(scope="module")
def hf_tiny():
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    hf_cfg = HFConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=16, dtype="float32",
    )
    return model, cfg


class TestLlamaParity:
    def test_logits_match_hf(self, hf_tiny):
        model, cfg = hf_tiny
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        params = jax.tree.map(jnp.asarray, convert_llama(state, cfg))

        ids = np.array([[1, 5, 9, 44, 100, 7, 3, 21]], dtype=np.int64)
        with torch.no_grad():
            hf_logits = model(torch.from_numpy(ids)).logits.numpy()

        pos = jnp.arange(ids.shape[1])[None]
        embeds = llama.embed_tokens(params, jnp.asarray(ids))
        hidden = llama.forward_hidden(cfg, params, embeds, pos)
        ours = np.asarray(llama.logits_from_hidden(params, hidden))

        np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)

    def test_greedy_continuation_matches(self, hf_tiny):
        model, cfg = hf_tiny
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        params = jax.tree.map(jnp.asarray, convert_llama(state, cfg))

        ids = np.array([[1, 17, 23, 5]], dtype=np.int64)
        with torch.no_grad():
            hf_out = model.generate(
                torch.from_numpy(ids), max_new_tokens=6, do_sample=False,
                pad_token_id=0,
            ).numpy()[0, 4:]

        from revisionllm_tpu.models import generation

        embeds = llama.embed_tokens(params, jnp.asarray(ids))
        pos = jnp.arange(4)[None]
        out = generation.generate(
            cfg, params, embeds, pos, jnp.array([4]), eos_id=2, max_new_tokens=6
        )
        ours = np.asarray(out["tokens"][0])
        valid = np.asarray(out["valid"][0])
        for i in range(6):
            if not valid[i]:
                break
            assert ours[i] == hf_out[i], f"step {i}: {ours} vs {hf_out}"


class TestMHAConversion:
    def test_torch_encoder_layer_parity(self):
        """Reference-style post-norm torch encoder layer vs our jnp layer on
        converted weights (validates the in_proj split + transposes)."""
        d, heads, f = 32, 4, 64
        torch.manual_seed(1)

        layer = torch.nn.ModuleDict(
            {
                "self_attn": torch.nn.MultiheadAttention(d, heads, dropout=0.0),
                "linear1": torch.nn.Linear(d, f),
                "linear2": torch.nn.Linear(f, d),
                "norm1": torch.nn.LayerNorm(d),
                "norm2": torch.nn.LayerNorm(d),
            }
        ).eval()

        B, L = 2, 7
        rng = np.random.default_rng(0)
        src = rng.normal(size=(B, L, d)).astype(np.float32)
        pos = np.asarray(
            sine_positions(jnp.ones((B, L)), d), dtype=np.float32
        )

        # torch reference math (transformer.py:210-223 forward_post)
        src_t = torch.from_numpy(src).permute(1, 0, 2)  # [L, B, d]
        pos_t = torch.from_numpy(pos).permute(1, 0, 2)
        with torch.no_grad():
            q = k = src_t + pos_t
            attn, _ = layer["self_attn"](q, k, value=src_t)
            x = src_t + attn
            x = layer["norm1"](x)
            ff = layer["linear2"](torch.relu(layer["linear1"](x)))
            x = x + ff
            x = layer["norm2"](x)
        want = x.permute(1, 0, 2).numpy()

        # convert + run ours
        sd = {
            "L.self_attn.in_proj_weight": layer["self_attn"].in_proj_weight.detach().numpy(),
            "L.self_attn.in_proj_bias": layer["self_attn"].in_proj_bias.detach().numpy(),
            "L.self_attn.out_proj.weight": layer["self_attn"].out_proj.weight.detach().numpy(),
            "L.self_attn.out_proj.bias": layer["self_attn"].out_proj.bias.detach().numpy(),
            "L.linear1.weight": layer["linear1"].weight.detach().numpy(),
            "L.linear1.bias": layer["linear1"].bias.detach().numpy(),
            "L.linear2.weight": layer["linear2"].weight.detach().numpy(),
            "L.linear2.bias": layer["linear2"].bias.detach().numpy(),
            "L.norm1.weight": layer["norm1"].weight.detach().numpy(),
            "L.norm1.bias": layer["norm1"].bias.detach().numpy(),
            "L.norm2.weight": layer["norm2"].weight.detach().numpy(),
            "L.norm2.bias": layer["norm2"].bias.detach().numpy(),
        }
        ours_params = jax.tree.map(jnp.asarray, _convert_mha_layer("L", sd, d, np.float32))
        got, _ = _encoder_layer_post(
            ours_params, jnp.asarray(src), jnp.asarray(pos),
            jnp.ones((B, L), dtype=bool), heads, 0.0, True, jax.random.PRNGKey(0),
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


class TestPeftLora:
    def test_convert_peft_dir(self, tmp_path, hf_tiny):
        _, cfg = hf_tiny
        import json

        adapter_cfg = {
            "r": 4, "lora_alpha": 8, "lora_dropout": 0.0,
            "target_modules": ["q_proj", "v_proj"],
        }
        (tmp_path / "adapter_config.json").write_text(json.dumps(adapter_cfg))
        state = {}
        for i in range(cfg.num_layers):
            for name, din, dout in (("q_proj", 64, 64), ("v_proj", 64, 64)):
                state[f"base_model.model.model.layers.{i}.self_attn.{name}.lora_A.weight"] = (
                    torch.randn(4, din)
                )
                state[f"base_model.model.model.layers.{i}.self_attn.{name}.lora_B.weight"] = (
                    torch.randn(dout, 4)
                )
        torch.save(state, tmp_path / "adapter_model.bin")

        lora, lora_cfg = convert_peft_lora(str(tmp_path), cfg)
        assert lora_cfg.r == 4 and lora_cfg.alpha == 8
        assert set(lora["layers"]) == {"q_proj", "v_proj"}
        assert lora["layers"]["q_proj"]["a"].shape == (2, 64, 4)
        assert lora["layers"]["q_proj"]["b"].shape == (2, 4, 64)
