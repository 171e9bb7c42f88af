"""Statistical sanity for the opt-in quantized paths: on a tiny model with
random weights, W8A8 and int8-KV decode must agree with the fp paths on the
overwhelming majority of greedy decisions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.config import LlamaConfig
from revisionllm_tpu.models import llama
from revisionllm_tpu.ops.quant import quantize_int8, w8a8_matmul


class TestW8A8Argmax:
    def test_argmax_agreement(self):
        """Per-row argmax of x@W survives double int8 quantization for the
        vast majority of rows (random gaussian regime)."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32))
        q, s = quantize_int8(w)
        a_fp = np.argmax(np.asarray(x @ w), axis=-1)
        a_q = np.argmax(np.asarray(w8a8_matmul(x, q, s)), axis=-1)
        agreement = (a_fp == a_q).mean()
        assert agreement > 0.95, agreement


class TestKv8Argmax:
    def test_greedy_agreement(self):
        cfg = LlamaConfig(**{**LlamaConfig.tiny().__dict__, "dtype": "float32"})
        params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        rng = np.random.default_rng(1)
        agree, total = 0, 0
        for trial in range(8):
            B, P = 4, 12
            ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, P)))
            pos = jnp.broadcast_to(jnp.arange(P), (B, P))
            lens = jnp.full((B,), P, jnp.int32)
            e = llama.embed_tokens(params, ids)
            _, kv = llama.prefill_kv(cfg, params, e, pos, kv_lens=lens)
            gen = {
                "k": jnp.zeros((cfg.num_layers, B, 2, cfg.num_kv_heads, cfg.head_dim)),
                "v": jnp.zeros((cfg.num_layers, B, 2, cfg.num_kv_heads, cfg.head_dim)),
            }
            tok = llama.embed_tokens(params, ids[:, :1])
            lg_fp, _ = llama.decode_step_split(cfg, params, kv, lens, gen, jnp.int32(0), tok)
            lg_q8, _ = llama.decode_step_split(
                cfg, params, llama.quantize_prompt_kv(kv), lens, gen, jnp.int32(0), tok
            )
            agree += int((np.argmax(np.asarray(lg_fp), -1) == np.argmax(np.asarray(lg_q8), -1)).sum())
            total += B
        assert agree / total > 0.85, (agree, total)
