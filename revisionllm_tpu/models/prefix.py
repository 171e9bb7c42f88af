"""P-tuning v2 prefix encoder (ChatGLM2 surface).

Parity: reference model/chatglm/modeling_chatglm.py PrefixEncoder (:61-89)
and ChatGLMModel.get_prompt (:770-783). Semantics reproduced exactly:

- a learned table of `pre_seq_len` entries, each holding one (k, v) pair per
  layer per kv head — optionally re-encoded by a two-layer tanh MLP
  (`prefix_projection`, :71-79);
- the prefix k/v are prepended to every sequence's attention keys/values;
  NO rotary is applied to them (they bypass the rope path entirely — they
  enter as past_key_values, :808-812);
- every query position may attend to the whole prefix (the reference
  prepends ones to the attention mask, :813-814);
- real-token positions are NOT shifted by the prefix
  (modeling_chatglm.py:1061-1062 subtracts pre_seq_len from past_length);
- dropout 0.1 on the prefix during training (:765, get_prompt).

TPU-native shape: the prefix is computed ONCE per forward as stacked
[L, 1, P, KH, hd] arrays (batch dim 1 — broadcast across rows inside the
two-piece attention, exactly like prefill_shared_prefix's shared prefix),
and the layer scan consumes it as a per-layer xs slice.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from revisionllm_tpu.config import LlamaConfig


def init_prefix_params(
    cfg: LlamaConfig,
    pre_seq_len: int,
    rng: jax.Array,
    prefix_projection: bool = False,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Fresh P-tuning parameters (reference PrefixEncoder.__init__).

    kv_size = num_layers * kv_channels * multi_query_group_num * 2
    (modeling_chatglm.py:73); with projection the embedding keeps kv_size
    width and the 2-layer MLP maps kv_size -> hidden -> kv_size (:75-79).
    """
    kv_size = cfg.num_layers * 2 * cfg.num_kv_heads * cfg.head_dim
    k1, k2, k3 = jax.random.split(rng, 3)
    out: Dict[str, Any] = {
        "embed": (0.02 * jax.random.normal(k1, (pre_seq_len, kv_size))).astype(dtype)
    }
    if prefix_projection:
        D = cfg.hidden_size
        out["proj"] = {
            "w1": (0.02 * jax.random.normal(k2, (kv_size, D))).astype(dtype),
            "b1": jnp.zeros((D,), dtype),
            "w2": (0.02 * jax.random.normal(k3, (D, kv_size))).astype(dtype),
            "b2": jnp.zeros((kv_size,), dtype),
        }
    return out


def prefix_kv(
    cfg: LlamaConfig,
    pparams: Dict[str, Any],
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Prefix parameters -> (pk, pv), each [L, 1, P, KH, hd].

    Mirrors get_prompt's view/permute/split (modeling_chatglm.py:773-783):
    [P, L*2*KH*hd] -> [P, L, 2, KH, hd] -> per-layer k/v stacks. Dropout
    (rate 0.1 in the reference) applies to the prefix values when a rng is
    given (training); inference passes none.
    """
    x = pparams["embed"]
    if "proj" in pparams:
        p = pparams["proj"]
        x = jnp.tanh(x @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]
    P = x.shape[0]
    L, KH, hd = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    x = x.reshape(P, L, 2, KH, hd)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, x.shape)
        x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0).astype(x.dtype)
    x = jnp.transpose(x, (1, 2, 0, 3, 4))  # [L, 2, P, KH, hd]
    return x[:, 0][:, None], x[:, 1][:, None]
