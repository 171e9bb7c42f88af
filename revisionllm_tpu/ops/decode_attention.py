"""Pallas decode-attention kernel (head-major split-KV layout).

STUDY ARTIFACT — NOT ON THE SERVING PATH. Every variant in this module was
measured SLOWER than the XLA einsum path it targets (BENCH_NOTES
'Decode-step deep dive': per-grid-cell fixed cost dominates at the 32k
cells/step this granularity implies); the round-2 whole-step megakernel
(ops/decode_step.py) is the successor experiment and carries the same
conclusion at kernel scope. Kept, with its tests, as the recorded negative
result that shaped the decode roadmap.

The XLA einsum path for single-token decode attention runs ~19x off the
KV-read floor on v5e (measured 8.4 ms/step vs 0.45 ms floor at B=32, S=318,
32 heads — batched [1,128]x[128,S] matvecs tile poorly, and changing the
einsum layout measures no better). This kernel streams (batch row, 8-head)
KV slabs into VMEM and fuses prompt scores, gen-cache scores, a shared-max
two-piece softmax, and the value contraction — zero HBM intermediates.

Layout matters twice here: the caches must be head-major [B, KH, S, hd] so
(a) the Mosaic block (1, hb, S, hd) keeps its last-two dims legal and
(b) a fixed-head slice is contiguous in VMEM tiles — with the storage-order
[B, S, KH, hd] blocks, per-head slices shred across (8,128) tiles and the
kernel measured 3x SLOWER than the einsums. generate() transposes the
prompt cache once per call (amortized over all decode steps).

Counterpart of the reference's eager torch SDPA decode step
(revisionllm/model/language_model/llava_llama.py generate path); the split
prompt/gen cache itself is models/llama.py:decode_step_split.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_attn_kernel(
    lens_ref,    # scalar prefetch: [B] int32 prompt lengths
    step_ref,    # scalar prefetch: [1] int32 current gen slot
    q_ref,       # [1, hb, group, hd]
    pk_ref,      # [1, hb, S, hd]
    pv_ref,      # [1, hb, S, hd]
    gk_ref,      # [1, hb, G, hd]
    gv_ref,      # [1, hb, G, hd]
    o_ref,       # [1, hb, group, hd]
    *,
    scale: float,
):
    b = pl.program_id(0)
    S = pk_ref.shape[2]
    G = gk_ref.shape[2]
    hb, group = q_ref.shape[1], q_ref.shape[2]

    plen = lens_ref[b]
    step = step_ref[0]

    # Mosaic-friendly formulation: 2D ops only, no shape casts. 3D broadcasts
    # lower to >2D gathers (rejected), per-head matvecs run on one sublane
    # (measured 2.4x slower than the einsums), and [hb*S] -> [hb, S] reshapes
    # are unsupported shape casts. So everything lives in row-space:
    # KV slabs fold to [hb*S, hd] rows; scores for ALL head pairs come from
    # one small MXU dot [hb*S, hd] x [hd, hb]; the block one-hot `sel`
    # selects each row's own head, and per-head max / sum / value reductions
    # are masked column-reduces and select-matmuls over `sel`.
    hd_ = q_ref.shape[3]
    hbS, hbG = hb * S, hb * G
    q2 = q_ref[0].reshape(hb, hd_).astype(jnp.float32) * scale

    def sel_mask(rows, seg):
        row_head = jax.lax.broadcasted_iota(jnp.int32, (rows, hb), 0) // seg
        col_head = jax.lax.broadcasted_iota(jnp.int32, (rows, hb), 1)
        return row_head == col_head

    sel_p = sel_mask(hbS, S)                              # [hb*S, hb] bool
    sel_g = sel_mask(hbG, G)
    pos_p = jax.lax.broadcasted_iota(jnp.int32, (hbS, hb), 0) % S
    pos_g = jax.lax.broadcasted_iota(jnp.int32, (hbG, hb), 0) % G
    valid_p = jnp.logical_and(sel_p, pos_p < plen)        # [hb*S, hb]
    valid_g = jnp.logical_and(sel_g, pos_g <= step)

    pk2 = pk_ref[0].reshape(hbS, hd_).astype(jnp.float32)
    gk2 = gk_ref[0].reshape(hbG, hd_).astype(jnp.float32)
    s1_all = jax.lax.dot_general(                         # [hb*S, hb]
        pk2, q2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s2_all = jax.lax.dot_general(                         # [hb*G, hb]
        gk2, q2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s1_all = jnp.where(valid_p, s1_all, -2.0e30)
    s2_all = jnp.where(valid_g, s2_all, -2.0e30)

    # per-head max: column-reduce over rows, then row-select back
    m_col = jnp.maximum(                                  # [1, hb]
        jnp.max(s1_all, axis=0, keepdims=True),
        jnp.max(s2_all, axis=0, keepdims=True),
    )
    m1 = jnp.sum(
        jnp.where(sel_p, m_col, 0.0), axis=-1, keepdims=True
    )                                                     # [hb*S, 1]
    m2 = jnp.sum(jnp.where(sel_g, m_col, 0.0), axis=-1, keepdims=True)

    # row-select each row's own-head score (masked rows carry -2e30 -> p=0)
    s1c = jnp.sum(jnp.where(sel_p, s1_all, 0.0), axis=-1, keepdims=True)
    s2c = jnp.sum(jnp.where(sel_g, s2_all, 0.0), axis=-1, keepdims=True)
    p1 = jnp.exp(s1c - m1)                                # [hb*S, 1]
    p2 = jnp.exp(s2c - m2)

    self_p = sel_p.astype(jnp.float32)
    self_g = sel_g.astype(jnp.float32)
    denom = jax.lax.dot_general(                          # [hb, 1]
        self_p, p1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        self_g, p2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    pv2 = pv_ref[0].reshape(hbS, hd_).astype(jnp.float32)
    gv2 = gv_ref[0].reshape(hbG, hd_).astype(jnp.float32)
    w1 = self_p * p1                                      # [hb*S, hb]
    w2 = self_g * p2
    o = jax.lax.dot_general(                              # [hb, hd]
        w1, pv2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        w2, gv2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / denom).reshape(hb, 1, hd_).astype(o_ref.dtype)


def _head_block(KH: int) -> int:
    """Head-slab size: 8 keeps DMAs ~650 KB at S=320 with a small VMEM
    footprint; full-KH blocks for narrow-KV models (always legal)."""
    if KH % 8 == 0:
        return 8
    return KH


def decode_attention(
    q: jnp.ndarray,            # [B, KH, group, hd] (rope already applied)
    prompt_k: jnp.ndarray,     # [B, KH, S, hd]  (head-major!)
    prompt_v: jnp.ndarray,     # [B, KH, S, hd]
    gen_k: jnp.ndarray,        # [B, KH, G, hd]
    gen_v: jnp.ndarray,        # [B, KH, G, hd]
    prompt_lens: jnp.ndarray,  # [B] int32
    step: jnp.ndarray,         # scalar int32 — current gen slot (inclusive)
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-token attention over [prompt | generated] -> [B, KH, group, hd]."""
    B, KH, group, hd = q.shape
    if group != 1:
        # the 2D block-diagonal formulation assumes one query row per kv
        # head; GQA/MQA (group > 1, e.g. ChatGLM2) uses the einsum fallback
        return decode_attention_reference(
            q, prompt_k, prompt_v, gen_k, gen_v, prompt_lens, step
        )
    S = prompt_k.shape[2]
    G = gen_k.shape[2]
    scale = hd ** -0.5
    hb = _head_block(KH)

    kernel = functools.partial(_decode_attn_kernel, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, KH // hb),
            in_specs=[
                pl.BlockSpec((1, hb, group, hd), lambda b, h, lens, st: (b, h, 0, 0)),
                pl.BlockSpec((1, hb, S, hd), lambda b, h, lens, st: (b, h, 0, 0)),
                pl.BlockSpec((1, hb, S, hd), lambda b, h, lens, st: (b, h, 0, 0)),
                pl.BlockSpec((1, hb, G, hd), lambda b, h, lens, st: (b, h, 0, 0)),
                pl.BlockSpec((1, hb, G, hd), lambda b, h, lens, st: (b, h, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, hb, group, hd), lambda b, h, lens, st: (b, h, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, KH, group, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        prompt_lens.astype(jnp.int32),
        jnp.asarray(step, jnp.int32).reshape(1),
        q, prompt_k, prompt_v, gen_k, gen_v,
    )
    return out


def decode_attention_reference(
    q, prompt_k, prompt_v, gen_k, gen_v, prompt_lens, step
) -> jnp.ndarray:
    """jnp fallback for CPU/GPU, same head-major signature."""
    B, KH, group, hd = q.shape
    S, G = prompt_k.shape[2], gen_k.shape[2]
    scale = hd ** -0.5
    qf = q.astype(jnp.float32) * scale
    s1 = jnp.einsum("bkgd,bksd->bkgs", qf, prompt_k.astype(jnp.float32))
    s2 = jnp.einsum("bkgd,bksd->bkgs", qf, gen_k.astype(jnp.float32))
    pmask = jnp.arange(S)[None, :] < prompt_lens[:, None]
    gmask = jnp.arange(G)[None, :] <= step
    s1 = jnp.where(pmask[:, None, None, :], s1, -2.0e30)
    s2 = jnp.where(gmask[:, None, None, :], s2, -2.0e30)
    m = jnp.maximum(s1.max(-1, keepdims=True), s2.max(-1, keepdims=True))
    p1, p2 = jnp.exp(s1 - m), jnp.exp(s2 - m)
    denom = p1.sum(-1, keepdims=True) + p2.sum(-1, keepdims=True)
    o = (
        jnp.einsum("bkgs,bksd->bkgd", p1, prompt_v.astype(jnp.float32))
        + jnp.einsum("bkgs,bksd->bkgd", p2, gen_v.astype(jnp.float32))
    ) / denom
    return o.astype(q.dtype)


def decode_attention_auto(
    q, prompt_k, prompt_v, gen_k, gen_v, prompt_lens, step
) -> jnp.ndarray:
    """Kernel on TPU, einsum fallback elsewhere (tests/CPU)."""
    if jax.default_backend() in ("cpu", "gpu"):
        return decode_attention_reference(
            q, prompt_k, prompt_v, gen_k, gen_v, prompt_lens, step
        )
    return decode_attention(q, prompt_k, prompt_v, gen_k, gen_v, prompt_lens, step)
