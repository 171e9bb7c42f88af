"""Pallas TPU flash attention (forward) + jnp reference implementation.

TPU-native replacement for the flash-attn CUDA kernels the reference monkey-
patches into HF Llama (reference: revisionllm/train/llama_flash_attn_monkey_patch.py:19-102
and README.md:52-56). Design follows the online-softmax blocked algorithm:

- grid (batch, q_heads, q_blocks, kv_blocks); the kv axis is innermost so the
  fp32 (m, l, acc) VMEM scratch carries across kv blocks of one q block.
- bf16 q/k/v feed the MXU with fp32 accumulation
  (`preferred_element_type=jnp.float32`).
- causal masking skips fully-masked kv blocks (`pl.when` predication) and
  edge-masks the diagonal block; optional per-batch `kv_lens` masks padded
  kv columns for ragged batches.
- GQA is handled in the BlockSpec index map (kv head = q head // group) so
  no repeated k/v materialization is needed.

Training uses `mha_reference` under `jax.checkpoint` (XLA fuses the softmax
chain); the Pallas kernel carries the no-grad decode/prefill hot path. A
custom-VJP Pallas backward is planned (tracked in ROADMAP).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.0e30


def _flash_kernel(
    kv_lens_ref,  # [B] int32 (SMEM scalar prefetch)
    q_ref,        # [1, 1, block_q, d]
    k_ref,        # [1, 1, block_k, d]
    v_ref,        # [1, 1, block_k, d]
    o_ref,        # [1, 1, block_q, d]
    m_scratch,    # [block_q, 128] f32
    l_scratch,    # [block_q, 128] f32
    acc_scratch,  # [block_q, d] f32
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    num_kv_blocks: int,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    kv_len = kv_lens_ref[b]
    # Skip kv blocks that are entirely in the causal future or fully padded.
    block_live = (ik * block_k) < kv_len
    if causal:
        block_live = jnp.logical_and(
            block_live, (ik * block_k) <= (iq * block_q + block_q - 1)
        )

    @pl.when(block_live)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * sm_scale  # [block_q, block_k]

        col_ids = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = col_ids < kv_len
        if causal:
            row_ids = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            mask = jnp.logical_and(mask, row_ids >= col_ids)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scratch[:, :1]  # [block_q, 1] (value replicated across lanes)
        l_prev = l_scratch[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)  # [block_q, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [block_q, block_k]
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        m_scratch[...] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[0, 0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scratch[...] = acc_scratch[...] * alpha + pv

    @pl.when(ik == num_kv_blocks - 1)
    def _finalize():
        l = l_scratch[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0, ...] = (acc_scratch[...] / l_safe).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    kv_lens: Optional[jnp.ndarray] = None,
    sm_scale: Optional[float] = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Blocked attention. q: [B, T, H, d]; k/v: [B, S, KH, d] with H % KH == 0.

    Returns [B, T, H, d] in q.dtype. `kv_lens` [B] masks padded kv columns;
    default = full S.
    """
    B, T, H, d = q.shape
    S, KH = k.shape[1], k.shape[2]
    group = H // KH
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    block_q = min(block_q, max(T, 1))
    block_k = min(block_k, max(S, 1))

    # [B, H, T, d] layout so the kernel works on contiguous (seq, d) tiles.
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    pad_t = (-T) % block_q
    pad_s = (-S) % block_k
    if pad_t:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
    if pad_s:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
    Tp, Sp = T + pad_t, S + pad_s

    if kv_lens is None:
        kv_lens = jnp.full((B,), S, dtype=jnp.int32)
    kv_lens = jnp.minimum(kv_lens.astype(jnp.int32), S)

    num_q_blocks = Tp // block_q
    num_kv_blocks = Sp // block_k

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, num_q_blocks, num_kv_blocks),
        in_specs=[
            # index maps receive the scalar-prefetch ref as a trailing arg
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, iq, ik, kv: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, iq, ik, kv: (b, h // group, ik, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, iq, ik, kv: (b, h // group, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b, h, iq, ik, kv: (b, h, iq, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tp * Sp * d,
            bytes_accessed=2 * (B * H * Tp * d + 2 * B * KH * Sp * d),
            transcendentals=B * H * Tp * Sp,
        ),
        interpret=interpret,
    )(kv_lens, qt, kt, vt)

    out = out[:, :, :T, :]
    return jnp.swapaxes(out, 1, 2)


def mha_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    kv_lens: Optional[jnp.ndarray] = None,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Plain jnp attention, same contract as `flash_attention`.

    Used for CPU tests, and (under jax.checkpoint) as the differentiable
    training path until the Pallas backward lands.
    """
    B, T, H, d = q.shape
    S, KH = k.shape[1], k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if KH != H:
        rep = H // KH
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s * sm_scale
    mask = jnp.ones((B, 1, T, S), dtype=bool)
    if kv_lens is not None:
        col = jnp.arange(S)[None, None, None, :]
        mask = jnp.logical_and(mask, col < kv_lens[:, None, None, None])
    if causal:
        row = jnp.arange(T)[:, None]
        col = jnp.arange(S)[None, :]
        mask = jnp.logical_and(mask, (row >= col)[None, None])
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    kv_lens: Optional[jnp.ndarray] = None,
    sm_scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Backend dispatcher: Pallas kernel on TPU, jnp reference elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu", "gpu")
    if use_pallas:
        return flash_attention(q, k, v, causal=causal, kv_lens=kv_lens, sm_scale=sm_scale)
    return mha_reference(q, k, v, causal=causal, kv_lens=kv_lens, sm_scale=sm_scale)
