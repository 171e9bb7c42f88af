"""CLIP-space proposal scoring (text-conditioned frame pooling).

TPU-native counterpart of the reference scorer
(revisionllm/eval/similarity.py): jnp / vmap over proposals, so the cosine
re-ranking runs inside the same compiled program as decode instead of a host
loop over proposals.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


def topk_pooling(text_embeds: jnp.ndarray, video_embeds: jnp.ndarray, k: int) -> jnp.ndarray:
    """Pool the k frames most similar to each text query.

    text_embeds: [num_texts, d]; video_embeds: [num_vids, num_frames, d].
    Returns [num_vids, num_texts, d] = sum of the top-k frames per (vid, text).
    Parity: _topk_pooling (reference revisionllm/eval/similarity.py:71-94).
    """
    sims = jnp.einsum("vfd,td->vft", video_embeds, text_embeds)
    _, topk_idx = jax.lax.top_k(jnp.swapaxes(sims, 1, 2), k)  # [v, t, k]
    gathered = jnp.take_along_axis(
        video_embeds[:, None, :, :], topk_idx[..., None], axis=2
    )  # [v, t, k, d]
    return jnp.sum(gathered, axis=2)


def attention_pooling(
    text_embeds: jnp.ndarray, video_embeds: jnp.ndarray, temperature: float
) -> jnp.ndarray:
    """Softmax-weighted frame pooling
    (parity: _attention_pooling, reference similarity.py:96-113)."""
    sims = jnp.einsum("vfd,td->vft", video_embeds, text_embeds)
    weights = jax.nn.softmax(sims / temperature, axis=1)  # over frames
    return jnp.einsum("vfd,vft->vtd", video_embeds, weights)


def span_cxw_to_xx(cxw_spans: jnp.ndarray) -> jnp.ndarray:
    """(center, width) spans -> (start, end)
    (parity: reference similarity.py:5-21)."""
    x1 = cxw_spans[..., 0] - 0.5 * cxw_spans[..., 1]
    x2 = cxw_spans[..., 0] + 0.5 * cxw_spans[..., 1]
    return jnp.stack([x1, x2], axis=-1)


def proposal_cosine_scores(
    query_cls: jnp.ndarray,
    frames: jnp.ndarray,
    frame_valid: jnp.ndarray,
    k: int = 3,
) -> jnp.ndarray:
    """Score one proposal's frames against the query CLS embedding.

    query_cls: [d] (pre-L2-normalized); frames: [max_len, d] (zero-padded);
    frame_valid: [max_len] bool. Returns the scalar cosine score of the
    top-k-pooled proposal embedding — the per-proposal score the stage-1 eval
    computes (reference eval_nlq_negative.py:309-320: frame-normalize, top-k
    pool with k = min(len, 3), einsum with query_cls, .item()).

    The reference normalizes each proposal with `norm(dim=0)` (per-feature
    across frames, eval_nlq_negative.py:311-312); here we default to the
    mathematically intended per-frame L2 norm, masked to valid frames, and
    restrict the top-k to valid frames by masking sims to -inf.

    Set REVISIONLLM_EXACT_COSINE=1 to reproduce the reference quirk
    bit-for-bit (per-feature norm across frames) for A/B against reference
    score_cos logs; zero-padded rows contribute nothing to a dim=0 norm, so
    the fixed-shape vmapped form matches the reference's variable-length
    slices exactly.
    """
    if os.environ.get("REVISIONLLM_EXACT_COSINE", "0") == "1":
        # proposal_feat / proposal_feat.norm(dim=0, keepdim=True): one norm
        # per feature over the frame axis. Padded rows are zero, so they
        # neither change the norms nor (being zero after division) the top-k
        # sums. The reference has no eps; the clamp only guards an
        # all-zero feature column, where torch would emit nan.
        colnorm = jnp.sqrt(jnp.sum(frames * frames, axis=0, keepdims=True))
        normed = frames / jnp.maximum(colnorm, 1e-12)
    else:
        normed = l2_normalize(frames, axis=-1, eps=1e-8)
    sims = normed @ query_cls  # [max_len]
    sims = jnp.where(frame_valid, sims, jnp.finfo(sims.dtype).min)
    _, idx = jax.lax.top_k(sims, k)
    picked = jnp.take(normed, idx, axis=0)  # [k, d]
    valid_k = jnp.take(frame_valid, idx)
    picked = jnp.where(valid_k[:, None], picked, 0.0)
    pooled = jnp.sum(picked, axis=0)  # [d]
    return pooled @ query_cls
