"""Sub-quadratic self-attention variants for the adapter's cross encoder.

Parity targets (reference model/adapter/cross_attn.py:99-130): the CrossLayer
`self_attn` options — 'performer' (performer_pytorch.SelfAttention, FAVOR+
softmax-kernel approximation), 'linformer' (LinformerSelfAttention with
k=256, one_kv_head=True, share_kv=True) and 'self-attn' (exact MHA). The
reference imports pip packages for the first two; this module implements the
algorithms directly as jnp einsums (TPU-friendly: two MXU contractions for
performer's linear attention, one seq-compression contraction for linformer
— no data-dependent shapes, everything jit-static).

- Performer: FAVOR+ positive random features (Choromanski et al. 2021,
  "Rethinking Attention with Performers", eq. 5):
      phi(x) = exp(W x - ||x||^2 / 2 - c) / sqrt(m),  W ~ orthogonal gaussian
  giving softmax(q k^T) V  ~=  phi(q) [phi(k)^T V] / (phi(q) [phi(k)^T 1]).
  Non-causal (the adapter attends over video frames bidirectionally).

- Linformer (Wang et al. 2020): keys/values compressed along the sequence by
  a learned [seq_len, k] projection before exact attention — O(L·k) scores.
  one_kv_head / share_kv follow the reference call: a single kv head whose
  k and v share one projection matrix.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def orthogonal_gaussian(rng: jax.Array, dim: int, m: int) -> jnp.ndarray:
    """[dim, m] random features: blocks of orthogonalized gaussians scaled to
    gaussian row norms (the performer_pytorch default, scaling=0)."""
    blocks = []
    remaining = m
    key = rng
    while remaining > 0:
        key, sub = jax.random.split(key)
        g = jax.random.normal(sub, (dim, dim), jnp.float32)
        qmat, _ = jnp.linalg.qr(g)
        blocks.append(qmat[:, : min(dim, remaining)])
        remaining -= dim
    w = jnp.concatenate(blocks, axis=1)  # [dim, m], orthonormal columns
    key, sub = jax.random.split(key)
    # restore gaussian lengths: chi(dim)-distributed column norms
    norms = jnp.sqrt(
        jnp.sum(jax.random.normal(sub, (m, dim)) ** 2, axis=-1)
    )
    return w * norms[None, :]


def performer_features(
    x: jnp.ndarray, proj: jnp.ndarray, is_query: bool, eps: float = 1e-6
):
    """phi(x) [B, L, H, m] for x [B, L, H, hd], proj [hd, m].

    Stabilizers follow the FAVOR+ reference implementation: a QUERY may
    subtract a per-position constant (it cancels between that query's
    numerator and normalizer), but KEYS must share ONE constant across all
    positions — a per-key offset would silently reweight that key's
    attention everywhere."""
    xf = x.astype(jnp.float32)
    xp = jnp.einsum("...d,dm->...m", xf, proj)
    sq = 0.5 * jnp.sum(xf * xf, axis=-1, keepdims=True)
    z = xp - sq
    if is_query:
        z = z - jnp.max(z, axis=-1, keepdims=True)
    else:
        z = z - jnp.max(z, axis=(1, 3), keepdims=True)
    return jnp.exp(z) + eps


def performer_self_attention(
    layer: Dict[str, Dict[str, jnp.ndarray]],
    x: jnp.ndarray,
    num_heads: int,
    proj: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """FAVOR+ linear self-attention. x [B, L, d]; proj [hd, m] random
    features; valid [B, L] masks padded positions out of the kv sums."""
    B, L, d = x.shape
    hd = d // num_heads

    def lin(p, t):
        return t @ p["w"] + p["b"]

    q = lin(layer["wq"], x).reshape(B, L, num_heads, hd) * (hd ** -0.25)
    k = lin(layer["wk"], x).reshape(B, L, num_heads, hd) * (hd ** -0.25)
    v = lin(layer["wv"], x).reshape(B, L, num_heads, hd).astype(jnp.float32)
    phi_q = performer_features(q, proj, is_query=True)   # [B, L, H, m]
    phi_k = performer_features(k, proj, is_query=False)
    if valid is not None:
        phi_k = phi_k * valid[:, :, None, None].astype(phi_k.dtype)
        v = v * valid[:, :, None, None].astype(v.dtype)
    kv = jnp.einsum("blhm,blhe->bhme", phi_k, v)       # [B, H, m, hd]
    ksum = jnp.sum(phi_k, axis=1)                      # [B, H, m]
    num = jnp.einsum("blhm,bhme->blhe", phi_q, kv)     # [B, L, H, hd]
    den = jnp.einsum("blhm,bhm->blh", phi_q, ksum)[..., None]
    o = (num / jnp.maximum(den, 1e-6)).reshape(B, L, d).astype(x.dtype)
    return lin(layer["wo"], o)


def linformer_self_attention(
    layer: Dict[str, Dict[str, jnp.ndarray]],
    x: jnp.ndarray,
    num_heads: int,
    e_proj: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Linformer self-attention, reference call semantics (cross_attn.py:114):
    k=|e_proj| compressed positions, ONE kv head, k/v SHARE the projection.
    x [B, L, d]; e_proj [L_max, k] (sliced to the live L)."""
    B, L, d = x.shape
    hd = d // num_heads

    def lin(p, t):
        return t @ p["w"] + p["b"]

    q = lin(layer["wq"], x).reshape(B, L, num_heads, hd)
    # one_kv_head: single-head k/v of width hd; share_kv ties them to ONE
    # projection ("wkv"), so gradients stay tied like the reference module
    if "wkv" in layer:
        k = lin(layer["wkv"], x).astype(jnp.float32)  # [B, L, hd]
        v = k
    else:
        k = lin(layer["wk"], x).astype(jnp.float32)
        v = lin(layer["wv"], x).astype(jnp.float32)
    e = e_proj[:L].astype(jnp.float32)            # [L, kdim]
    if valid is not None:
        m = valid[:, :, None].astype(jnp.float32)
        k = k * m
        v = v * m
    kc = jnp.einsum("bld,lk->bkd", k, e)          # [B, kdim, hd]
    vc = jnp.einsum("bld,lk->bkd", v, e)
    s = jnp.einsum("blhd,bkd->bhlk", q.astype(jnp.float32), kc) / math.sqrt(hd)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhlk,bkd->blhd", p, vc).reshape(B, L, d).astype(x.dtype)
    return lin(layer["wo"], o)
