"""Decode-confidence statistics from per-step logits.

TPU-native counterpart of the reference uncertainty module
(revisionllm/uncertainty/funs_get_feature_X.py:120-146): instead of stacking
host tensors after generation, these run as jnp ops over the [B, T, V] logits
buffer the compiled decode loop already holds in HBM, so confidence scoring is
fused into the same program as generation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def token_entropy(logits: jnp.ndarray) -> jnp.ndarray:
    """Per-step softmax entropy. logits: [..., V] -> [...].

    entropy = -sum(p * log(p + 1e-10)) with p = softmax(logits)
    (reference funs_get_feature_X.py:130-131). Computed in fp32.
    """
    logits = logits.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    return -jnp.sum(probs * jnp.log(probs + 1e-10), axis=-1)


def entropy_statistics(
    logits: jnp.ndarray, valid_mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """[B, T, V] logits -> [B, 4] (max, min, mean, std) of per-step entropy.

    Parity: get_entropy_statistics (reference funs_get_feature_X.py:120-146),
    extended with an optional validity mask so a fixed-size decode buffer can
    exclude post-EOS steps (the reference operates on the ragged list of
    actually-generated steps).
    """
    ent = token_entropy(logits)  # [B, T]
    if valid_mask is None:
        e_max = jnp.max(ent, axis=1)
        e_min = jnp.min(ent, axis=1)
        e_mean = jnp.mean(ent, axis=1)
        e_std = jnp.std(ent, axis=1, ddof=1)
        n = ent.shape[1]
        e_std = jnp.where(n > 1, e_std, 0.0)
    else:
        m = valid_mask.astype(jnp.float32)
        n = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        neg_inf = jnp.finfo(jnp.float32).min
        e_max = jnp.max(jnp.where(valid_mask, ent, neg_inf), axis=1)
        e_min = jnp.min(jnp.where(valid_mask, ent, -neg_inf), axis=1)
        e_mean = jnp.sum(ent * m, axis=1) / n
        var = jnp.sum(m * (ent - e_mean[:, None]) ** 2, axis=1) / jnp.maximum(n - 1.0, 1.0)
        e_std = jnp.where(n > 1, jnp.sqrt(var), 0.0)
    return jnp.stack([e_max, e_min, e_mean, e_std], axis=1)


def token_prob_statistics(
    logits: jnp.ndarray, tokens: jnp.ndarray, valid_mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """[B, T, V] logits + [B, T] chosen tokens -> [B, 6] probability stats.

    (-p max, -p min, -p mean, -p std, -log p mean, -log p std) over the decode
    steps — parity with get_prob_statistics
    (reference funs_get_feature_X.py:64-117) in its sequential-decode usage
    where each step's chosen token probability is scored.
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    p = jnp.take_along_axis(probs, tokens[..., None].astype(jnp.int32), axis=-1)[..., 0]
    logp = jnp.log(p + 1e-10)
    if valid_mask is None:
        valid_mask = jnp.ones(p.shape, dtype=bool)
    m = valid_mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    neg = -p
    neg_inf = jnp.finfo(jnp.float32).min
    p_max = jnp.max(jnp.where(valid_mask, neg, neg_inf), axis=1)
    p_min = jnp.min(jnp.where(valid_mask, neg, -neg_inf), axis=1)
    p_mean = jnp.sum(neg * m, axis=1) / n
    p_var = jnp.sum(m * (neg - p_mean[:, None]) ** 2, axis=1) / jnp.maximum(n - 1.0, 1.0)
    p_std = jnp.where(n > 1, jnp.sqrt(p_var), 0.0)
    lp_mean = jnp.sum(-logp * m, axis=1) / n
    lp_var = jnp.sum(m * (-logp - lp_mean[:, None]) ** 2, axis=1) / jnp.maximum(n - 1.0, 1.0)
    lp_std = jnp.where(n > 1, jnp.sqrt(lp_var), 0.0)
    return jnp.stack([p_max, p_min, p_mean, p_std, lp_mean, lp_std], axis=1)


def average_hidden_states(
    hidden_states: jnp.ndarray,
    layer_list,
    q_begin: int,
    q_end: int,
) -> jnp.ndarray:
    """Mean hidden state of selected layers over [q_begin, q_end).

    hidden_states: [num_layers, B, T, D] (the stacked per-layer activations
    our scan naturally produces). Parity: get_average_hidden_states
    (reference funs_get_feature_X.py:5-28). Returns [B, len(layer_list), D].
    """
    if q_begin == q_end:
        q_begin = q_end - 1
    sel = jnp.asarray(list(layer_list), jnp.int32)
    picked = jnp.take(hidden_states, sel, axis=0)  # [L', B, T, D]
    mean = jnp.mean(picked[:, :, q_begin:q_end, :], axis=2)  # [L', B, D]
    return jnp.swapaxes(mean, 0, 1)


def last_token_hidden_states(
    hidden_states: jnp.ndarray,
    layer_list,
    q_end: int,
    num_last_tokens: int,
) -> jnp.ndarray:
    """Last `num_last_tokens` hidden states before q_end per selected layer.

    Parity: get_last_token_hidden_states (reference
    funs_get_feature_X.py:31-61). Returns [B, len(layer_list), num_last, D].
    """
    sel = jnp.asarray(list(layer_list), jnp.int32)
    picked = jnp.take(hidden_states, sel, axis=0)
    window = picked[:, :, q_end - num_last_tokens : q_end, :]
    return jnp.swapaxes(window, 0, 1)
