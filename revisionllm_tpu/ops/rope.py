"""Rotary position embeddings (HF LLaMA convention).

The reference backbone inherits RoPE from HF's LlamaModel (wrapped at
revisionllm/model/vtimellm_llama.py:23); we reproduce the same half-split
rotation so converted Vicuna checkpoints are numerically compatible.

Angles are computed in fp32 and applied in fp32 before casting back — RoPE in
bf16 visibly degrades long-context grounding accuracy.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_angles(positions: jnp.ndarray, head_dim: int, theta: float = 10000.0):
    """positions [*, T] (int) -> (cos, sin) each [*, T, head_dim//2] fp32."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )  # [head_dim/2]
    ang = positions.astype(jnp.float32)[..., None] * inv_freq  # [*, T, hd/2]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope_interleaved(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, rotary_dim: int
) -> jnp.ndarray:
    """ChatGLM2-style rotary: only the first `rotary_dim` head dims rotate,
    in interleaved (even, odd) pairs; the tail passes through unchanged
    (reference model/chatglm/modeling_chatglm.py RotaryEmbedding +
    apply_rotary_pos_emb)."""
    orig_dtype = x.dtype
    rot = x[..., :rotary_dim].astype(jnp.float32)
    rest = x[..., rotary_dim:]
    x1 = rot[..., 0::2]
    x2 = rot[..., 1::2]
    c = cos[..., None, : rotary_dim // 2]
    s = sin[..., None, : rotary_dim // 2]
    r1 = x1 * c - x2 * s
    r2 = x2 * c + x1 * s
    rotated = jnp.stack([r1, r2], axis=-1).reshape(rot.shape).astype(orig_dtype)
    return jnp.concatenate([rotated, rest], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate q/k. x: [..., T, H, head_dim]; cos/sin: [..., T, hd/2].

    HF llama convention: the head dim is split in halves (x1 = x[..., :hd/2],
    x2 = x[..., hd/2:]) and rotated as (x1*cos - x2*sin, x2*cos + x1*sin).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    c = cos[..., None, :]  # broadcast over heads
    s = sin[..., None, :]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(orig_dtype)
