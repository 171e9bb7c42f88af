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

`make_flash_mha` provides the differentiable variant: a custom VJP whose
forward also emits the log-sum-exp rows and whose backward runs two more
Pallas kernels (dq; dk+dv) that rebuild the probability blocks from LSE — the
standard flash-attention backward, so training never materializes the
[B, H, T, S] score matrix either.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from revisionllm_tpu.utils.backend import is_tpu_backend as _is_tpu_backend

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

    bf16_scores = _attn_bf16_scores() and q.dtype == jnp.bfloat16
    sdt = jnp.bfloat16 if bf16_scores else jnp.float32
    s = jnp.einsum(
        "bthd,bshd->bhts", q.astype(sdt), k.astype(sdt),
        preferred_element_type=sdt,
    )
    s = s * jnp.asarray(sm_scale, sdt)
    mask = jnp.ones((B, 1, T, S), dtype=bool)
    if kv_lens is not None:
        col = jnp.arange(S)[None, None, None, :]
        mask = jnp.logical_and(mask, col < kv_lens[:, None, None, None])
    if causal:
        row = jnp.arange(T)[:, None]
        col = jnp.arange(S)[None, :]
        mask = jnp.logical_and(mask, (row >= col)[None, None])
    s = jnp.where(mask, s, jnp.asarray(NEG_INF, sdt))
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", p, v.astype(sdt))
    return out.astype(q.dtype)


_ATTN_BF16 = None


def _attn_bf16_scores() -> bool:
    """REVISIONLLM_ATTN_BF16=1: the short-seq einsum path keeps scores and
    softmax in bfloat16 — the [B, H, T, S] score tensor is the einsum path's
    dominant HBM traffic (~830 MB/layer f32 at chunk-64 serving shapes) and
    halving it measured 6.1 -> 4.0 ms/layer isolated (probe_mxu attn_f32 vs
    attn_bf16, round 5). Relative logit error ~0.4% — the same order as the
    already-promoted W8A8 matmul noise, and the serving K cache is int8
    (KV8) anyway.

    DEFAULT ON for TPU backends since round 5 (e2e: chunk 1834 -> 1774 ms,
    0.633 q/s; trained-model R1 A/B within the noise band — BENCH_NOTES
    round 5). REVISIONLLM_ATTN_BF16=0 opts out; non-TPU backends keep exact
    f32 scores so unit tests pin exact math, and the gate requires bf16
    inputs either way (f32/training paths unaffected)."""
    global _ATTN_BF16
    if _ATTN_BF16 is None:
        import os

        env = os.environ.get("REVISIONLLM_ATTN_BF16")
        if env is not None:
            _ATTN_BF16 = env == "1"
        else:
            from revisionllm_tpu.utils.backend import is_tpu_backend

            _ATTN_BF16 = is_tpu_backend()
    return _ATTN_BF16


_FLASH_MIN_SEQ = None


def _flash_min_seq() -> int:
    """Sequence-length threshold below which the XLA einsum path beats the
    Pallas flash kernel on TPU. Measured (round-3 prefill decomposition,
    chunk-64 serving shapes B=64 H=32 T=S=318): flash 468 ms / 32 layers vs
    XLA einsum 186 ms — the (B, H, iq, ik) grid is 18k cells/layer and the
    ~0.9 us fixed per-cell cost swamps the 0.5 ms of real compute. Flash wins
    again once T is large enough that the materialized [B, H, T, S] score
    tensor dominates (training at seq 2048+). REVISIONLLM_FLASH_MIN_SEQ
    overrides (0 = always flash)."""
    global _FLASH_MIN_SEQ
    if _FLASH_MIN_SEQ is None:
        import os

        _FLASH_MIN_SEQ = int(os.environ.get("REVISIONLLM_FLASH_MIN_SEQ", "512"))
    return _FLASH_MIN_SEQ


_EINSUM_SCORES_BYTES_MAX = 1_000_000_000  # per-layer f32 scores cutover


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
    """Backend dispatcher: Pallas kernel on TPU for long sequences, XLA einsum
    for short ones (where per-grid-cell overhead beats materializing scores —
    see _flash_min_seq) and on non-TPU backends."""
    if use_pallas is None:
        use_pallas = _is_tpu_backend()
    if use_pallas and max(q.shape[1], k.shape[1]) >= _flash_min_seq():
        return flash_attention(q, k, v, causal=causal, kv_lens=kv_lens, sm_scale=sm_scale)
    # short sequences: einsum wins on small batches, but its materialized
    # [B, H, T, S] f32 scores grow superlinearly with batch; above ~1 GB per
    # layer, one-cell-per-(b,h) flash (grid B*H, blocks spanning the whole
    # sequence) wins instead — measured at B=80, S=318, 7B: flash 1852.6 ms
    # full-prefill vs einsum 2064.4 (tie at B=64: 1407.7 vs 1413.0)
    if use_pallas:
        B, T, H, _ = q.shape
        S = k.shape[1]
        score_bytes = 2 if (_attn_bf16_scores() and q.dtype == jnp.bfloat16) else 4
        if B * H * T * S * score_bytes > _EINSUM_SCORES_BYTES_MAX:
            # flash_attention clamps block_q to T, so an 8-aligned round-up
            # here would be dead; one block spanning the whole (possibly
            # unaligned) sequence is the measured-fastest config at this size
            bq = min(T, 512)
            bk = min(-(-S // 128) * 128, 512)
            return flash_attention(
                q, k, v, causal=causal, kv_lens=kv_lens, sm_scale=sm_scale,
                block_q=bq, block_k=bk,
            )
    return mha_reference(q, k, v, causal=causal, kv_lens=kv_lens, sm_scale=sm_scale)


# ---------------------------------------------------------------------------
# Differentiable flash attention (custom VJP)
# ---------------------------------------------------------------------------


def _flash_fwd_lse_kernel(
    kv_lens_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch,
    *, causal, sm_scale, block_q, block_k, num_kv_blocks,
):
    """Forward kernel that also stores per-row log-sum-exp (for the VJP)."""
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    kv_len = kv_lens_ref[b]
    block_live = (ik * block_k) < kv_len
    if causal:
        block_live = jnp.logical_and(
            block_live, (ik * block_k) <= (iq * block_q + block_q - 1)
        )

    @pl.when(block_live)
    def _compute():
        s = jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        col_ids = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = col_ids < kv_len
        if causal:
            row_ids = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            mask = jnp.logical_and(mask, row_ids >= col_ids)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scratch[:, :1]
        l_prev = l_scratch[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scratch[...] = acc_scratch[...] * alpha + pv

    @pl.when(ik == num_kv_blocks - 1)
    def _finalize():
        m = m_scratch[:, :1]
        l = l_scratch[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0, ...] = (acc_scratch[...] / l_safe).astype(o_ref.dtype)
        # fully-masked rows get +inf LSE so the backward's exp() gives 0;
        # stored lane-replicated [bq, 128] (Mosaic requires 8x128 tiles)
        lse = jnp.where(l > 0.0, m + jnp.log(l), -NEG_INF)
        lse_ref[0, 0, ...] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _flash_dq_kernel(
    kv_lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    dq_scratch,
    *, causal, sm_scale, block_q, block_k, num_kv_blocks,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        dq_scratch[...] = jnp.zeros_like(dq_scratch)

    kv_len = kv_lens_ref[b]
    block_live = (ik * block_k) < kv_len
    if causal:
        block_live = jnp.logical_and(
            block_live, (ik * block_k) <= (iq * block_q + block_q - 1)
        )

    @pl.when(block_live)
    def _compute():
        s = jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        col_ids = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = col_ids < kv_len
        if causal:
            row_ids = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            mask = jnp.logical_and(mask, row_ids >= col_ids)
        lse = lse_ref[0, 0, :, :1]
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do_ref[0, 0], v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = delta_ref[0, 0, :, :1]
        ds = p * (dp - delta) * sm_scale
        dq_scratch[...] += jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == num_kv_blocks - 1)
    def _finalize():
        dq_ref[0, 0, ...] = dq_scratch[...].astype(dq_ref.dtype)


def _flash_dkv_kernel(
    kv_lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dk_scratch, dv_scratch,
    *, causal, sm_scale, block_q, block_k, num_q_blocks,
):
    b = pl.program_id(0)
    ik = pl.program_id(2)
    iq = pl.program_id(3)

    @pl.when(iq == 0)
    def _init():
        dk_scratch[...] = jnp.zeros_like(dk_scratch)
        dv_scratch[...] = jnp.zeros_like(dv_scratch)

    kv_len = kv_lens_ref[b]
    block_live = (ik * block_k) < kv_len
    if causal:
        # q blocks entirely above the diagonal contribute nothing
        block_live = jnp.logical_and(
            block_live, (iq * block_q + block_q - 1) >= (ik * block_k)
        )

    @pl.when(block_live)
    def _compute():
        s = jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        col_ids = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = col_ids < kv_len
        if causal:
            row_ids = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            mask = jnp.logical_and(mask, row_ids >= col_ids)
        lse = lse_ref[0, 0, :, :1]
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        # dv += p^T dO
        dv_scratch[...] += jax.lax.dot_general(
            p.astype(do_ref.dtype), do_ref[0, 0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_ref[0, 0], v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = delta_ref[0, 0, :, :1]
        ds = p * (dp - delta) * sm_scale
        # dk += ds^T q
        dk_scratch[...] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0, 0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(iq == num_q_blocks - 1)
    def _finalize():
        dk_ref[0, 0, ...] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0, 0, ...] = dv_scratch[...].astype(dv_ref.dtype)


def _pad_bhtd(x, pad_t):
    return jnp.pad(x, ((0, 0), (0, 0), (0, pad_t), (0, 0))) if pad_t else x


def make_flash_mha(
    *,
    causal: bool = True,
    sm_scale: Optional[float] = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
):
    """Differentiable flash attention for same-length q/kv (training shapes).

    Returns f(q, k, v, kv_lens) -> o with q/k/v [B, T, H|KH, d]. GQA handled
    by repeating kv heads before the kernels and group-summing dk/dv after.
    """

    def _prep(q, k, v):
        B, T, H, d = q.shape
        KH = k.shape[2]
        group = H // KH
        if group > 1:
            k = jnp.repeat(k, group, axis=2)
            v = jnp.repeat(v, group, axis=2)
        scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(d)
        bq = min(block_q, max(T, 1))
        bk = min(block_k, max(T, 1))
        qt = jnp.swapaxes(q, 1, 2)
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        pad_t = (-T) % max(bq, bk)
        qt, kt, vt = (_pad_bhtd(x, pad_t) for x in (qt, kt, vt))
        return qt, kt, vt, scale, bq, bk, T, group

    def _fwd_impl(q, k, v, kv_lens):
        B, T, H, d = q.shape
        qt, kt, vt, scale, bq, bk, T0, group = _prep(q, k, v)
        Tp = qt.shape[2]
        nq, nk = Tp // bq, Tp // bk
        if kv_lens is None:
            kv_lens = jnp.full((B,), T0, jnp.int32)
        kv_lens = jnp.minimum(kv_lens.astype(jnp.int32), T0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, nq, nk),
            in_specs=[
                pl.BlockSpec((1, 1, bq, d), lambda b, h, iq, ik, kv: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, bk, d), lambda b, h, iq, ik, kv: (b, h, ik, 0)),
                pl.BlockSpec((1, 1, bk, d), lambda b, h, iq, ik, kv: (b, h, ik, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, bq, d), lambda b, h, iq, ik, kv: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, bq, 128), lambda b, h, iq, ik, kv: (b, h, iq, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        )
        o, lse = pl.pallas_call(
            functools.partial(
                _flash_fwd_lse_kernel, causal=causal, sm_scale=scale,
                block_q=bq, block_k=bk, num_kv_blocks=nk,
            ),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, H, Tp, d), q.dtype),
                jax.ShapeDtypeStruct((B, H, Tp, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(kv_lens, qt, kt, vt)
        out = jnp.swapaxes(o[:, :, :T0], 1, 2)
        return out, (qt, kt, vt, kv_lens, o, lse, scale, bq, bk, T0, group)

    def _bwd_impl(residuals, g):
        qt, kt, vt, kv_lens, o, lse, scale, bq, bk, T0, group = residuals
        B, H, Tp, d = qt.shape
        nq, nk = Tp // bq, Tp // bk
        gt = jnp.swapaxes(g, 1, 2)
        gt = _pad_bhtd(gt, Tp - T0)
        delta = jnp.sum(gt.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
        delta = jnp.broadcast_to(delta[..., None], (B, H, Tp, 128))  # lane-replicated

        common_inputs = (kv_lens, qt, kt, vt, gt, lse, delta)
        in_specs = [
            pl.BlockSpec((1, 1, bq, d), lambda b, h, iq, ik, kv: (b, h, iq, 0)),   # q
            pl.BlockSpec((1, 1, bk, d), lambda b, h, iq, ik, kv: (b, h, ik, 0)),   # k
            pl.BlockSpec((1, 1, bk, d), lambda b, h, iq, ik, kv: (b, h, ik, 0)),   # v
            pl.BlockSpec((1, 1, bq, d), lambda b, h, iq, ik, kv: (b, h, iq, 0)),   # do
            pl.BlockSpec((1, 1, bq, 128), lambda b, h, iq, ik, kv: (b, h, iq, 0)),  # lse
            pl.BlockSpec((1, 1, bq, 128), lambda b, h, iq, ik, kv: (b, h, iq, 0)),  # delta
        ]
        dq = pl.pallas_call(
            functools.partial(
                _flash_dq_kernel, causal=causal, sm_scale=scale,
                block_q=bq, block_k=bk, num_kv_blocks=nk,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, H, nq, nk),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, 1, bq, d), lambda b, h, iq, ik, kv: (b, h, iq, 0)),
                scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, Tp, d), qt.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(*common_inputs)

        dkv_in_specs = [
            pl.BlockSpec((1, 1, bq, d), lambda b, h, ik, iq, kv: (b, h, iq, 0)),   # q
            pl.BlockSpec((1, 1, bk, d), lambda b, h, ik, iq, kv: (b, h, ik, 0)),   # k
            pl.BlockSpec((1, 1, bk, d), lambda b, h, ik, iq, kv: (b, h, ik, 0)),   # v
            pl.BlockSpec((1, 1, bq, d), lambda b, h, ik, iq, kv: (b, h, iq, 0)),   # do
            pl.BlockSpec((1, 1, bq, 128), lambda b, h, ik, iq, kv: (b, h, iq, 0)),  # lse
            pl.BlockSpec((1, 1, bq, 128), lambda b, h, ik, iq, kv: (b, h, iq, 0)),  # delta
        ]
        dk, dv = pl.pallas_call(
            functools.partial(
                _flash_dkv_kernel, causal=causal, sm_scale=scale,
                block_q=bq, block_k=bk, num_q_blocks=nq,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, H, nk, nq),
                in_specs=dkv_in_specs,
                out_specs=[
                    pl.BlockSpec((1, 1, bk, d), lambda b, h, ik, iq, kv: (b, h, ik, 0)),
                    pl.BlockSpec((1, 1, bk, d), lambda b, h, ik, iq, kv: (b, h, ik, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((bk, d), jnp.float32),
                    pltpu.VMEM((bk, d), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((B, H, Tp, d), kt.dtype),
                jax.ShapeDtypeStruct((B, H, Tp, d), vt.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(*common_inputs)

        dq = jnp.swapaxes(dq[:, :, :T0], 1, 2)
        dk = jnp.swapaxes(dk[:, :, :T0], 1, 2)
        dv = jnp.swapaxes(dv[:, :, :T0], 1, 2)
        if group > 1:
            B_, T_, H_, d_ = dk.shape
            dk = dk.reshape(B_, T_, H_ // group, group, d_).sum(axis=3)
            dv = dv.reshape(B_, T_, H_ // group, group, d_).sum(axis=3)
        return dq, dk, dv, None

    @jax.custom_vjp
    def flash_mha(q, k, v, kv_lens=None):
        return _fwd_impl(q, k, v, kv_lens)[0]

    def fwd(q, k, v, kv_lens):
        out, res = _fwd_impl(q, k, v, kv_lens)
        return out, res

    flash_mha.defvjp(fwd, _bwd_impl)
    return flash_mha


_FLASH_MHA_CACHE = {}


def trainable_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    kv_lens: Optional[jnp.ndarray] = None,
    sm_scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Differentiable dispatcher: custom-VJP Pallas kernels on TPU, jnp
    reference elsewhere. Requires T == S (training/prefill shapes)."""
    if use_pallas is None:
        use_pallas = _is_tpu_backend()
    if not use_pallas:
        return mha_reference(q, k, v, causal=causal, kv_lens=kv_lens, sm_scale=sm_scale)
    key = (causal, sm_scale)
    if key not in _FLASH_MHA_CACHE:
        _FLASH_MHA_CACHE[key] = make_flash_mha(causal=causal, sm_scale=sm_scale)
    return _FLASH_MHA_CACHE[key](q, k, v, kv_lens)


def flash_attention_lse(
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
) -> tuple:
    """Like `flash_attention` but also returns per-row logsumexp [B, T, H]
    (fp32) — the quantity needed to merge attention pieces computed over
    disjoint kv sets (shared-prefix prefill)."""
    B, T, H, d = q.shape
    S, KH = k.shape[1], k.shape[2]
    group = H // KH
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    bq = min(block_q, max(T, 1))
    bk = min(block_k, max(S, 1))

    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    pad_t = (-T) % bq
    pad_s = (-S) % bk
    if pad_t:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
    if pad_s:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
    Tp, Sp = T + pad_t, S + pad_s
    if kv_lens is None:
        kv_lens = jnp.full((B,), S, dtype=jnp.int32)
    kv_lens = jnp.minimum(kv_lens.astype(jnp.int32), S)
    nq, nk = Tp // bq, Sp // bk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, h, iq, ik, kv: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b, h, iq, ik, kv: (b, h // group, ik, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b, h, iq, ik, kv: (b, h // group, ik, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, h, iq, ik, kv: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, bq, 128), lambda b, h, iq, ik, kv: (b, h, iq, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    o, lse = pl.pallas_call(
        functools.partial(
            _flash_fwd_lse_kernel, causal=causal, sm_scale=sm_scale,
            block_q=bq, block_k=bk, num_kv_blocks=nk,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Tp, d), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tp, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lens, qt, kt, vt)
    o = jnp.swapaxes(o[:, :, :T], 1, 2)            # [B, T, H, d]
    lse = jnp.swapaxes(lse[:, :, :T, 0], 1, 2)     # [B, T, H]
    return o, lse


def mha_reference_lse(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    kv_lens: Optional[jnp.ndarray] = None,
    sm_scale: Optional[float] = None,
) -> tuple:
    """jnp twin of flash_attention_lse (CPU tests / prefix pieces)."""
    B, T, H, d = q.shape
    S, KH = k.shape[1], k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if KH != H:
        rep = H // KH
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32)) * sm_scale
    mask = jnp.ones((B, 1, T, S), dtype=bool)
    if kv_lens is not None:
        col = jnp.arange(S)[None, None, None, :]
        mask = jnp.logical_and(mask, col < kv_lens[:, None, None, None])
    if causal:
        row = jnp.arange(T)[:, None]
        col = jnp.arange(S)[None, :]
        mask = jnp.logical_and(mask, (row >= col)[None, None])
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhts,bshd->bthd", p / jnp.where(l == 0, 1.0, l), v.astype(jnp.float32))
    lse = jnp.where(l[..., 0] > 0, m[..., 0] + jnp.log(jnp.where(l[..., 0] == 0, 1.0, l[..., 0])), -NEG_INF)
    return o.astype(q.dtype), jnp.swapaxes(lse, 1, 2)  # [B,T,H,d], [B,T,H]


def attention_lse(
    q, k, v, *, causal=True, kv_lens=None, sm_scale=None, use_pallas=None
):
    if use_pallas is None:
        use_pallas = _is_tpu_backend()
    if use_pallas:
        return flash_attention_lse(q, k, v, causal=causal, kv_lens=kv_lens, sm_scale=sm_scale)
    return mha_reference_lse(q, k, v, causal=causal, kv_lens=kv_lens, sm_scale=sm_scale)


def merge_attention_pieces(o1, lse1, o2, lse2):
    """Combine two attention outputs computed over disjoint kv sets.

    oi: [B, T, H, d] (normalized within piece), lsei: [B, T, H].
    Standard logsumexp merge: o = (o1*w1 + o2*w2), wi = softmax over pieces.
    """
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)
    w2 = jnp.exp(lse2 - m)
    denom = w1 + w2
    w1 = (w1 / denom)[..., None]
    w2 = (w2 / denom)[..., None]
    return (o1.astype(jnp.float32) * w1 + o2.astype(jnp.float32) * w2).astype(o1.dtype)


def _flash_prefix_kernel(
    kv_lens_ref,  # [B] int32 (SMEM scalar prefetch)
    q_ref,        # [1, 1, block_q, d]
    pk_ref,       # [1, 1, block_k, d]  (prefix blocks, B=1 broadcast)
    pv_ref,
    k_ref,        # [1, 1, block_k, d]  (causal blocks)
    v_ref,
    o_ref,
    m_scratch, l_scratch, acc_scratch,
    *,
    sm_scale: float,
    block_q: int,
    block_k: int,
    num_prefix_blocks: int,
    num_kv_blocks: int,
    prefix_len: int,
):
    """Causal flash attention with a fully-visible shared prefix: the kv grid
    walks prefix blocks first (mask: col < prefix_len), then the causal blocks
    (local coordinates). One online softmax; no LSE materialization."""
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    total_blocks = num_prefix_blocks + num_kv_blocks

    @pl.when(ik == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    kv_len = kv_lens_ref[b]
    is_prefix = ik < num_prefix_blocks
    causal_idx = ik - num_prefix_blocks  # valid when not prefix
    block_live = jnp.logical_or(
        is_prefix,
        jnp.logical_and(
            (causal_idx * block_k) < kv_len,
            (causal_idx * block_k) <= (iq * block_q + block_q - 1),
        ),
    )

    @pl.when(block_live)
    def _compute():
        kblk = jnp.where(is_prefix, pk_ref[0, 0].astype(jnp.float32),
                         k_ref[0, 0].astype(jnp.float32)).astype(q_ref.dtype)
        vblk = jnp.where(is_prefix, pv_ref[0, 0].astype(jnp.float32),
                         v_ref[0, 0].astype(jnp.float32)).astype(q_ref.dtype)
        s = jax.lax.dot_general(
            q_ref[0, 0], kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        prefix_mask = (ik * block_k + col) < prefix_len
        local_col = causal_idx * block_k + col
        causal_mask = jnp.logical_and(local_col < kv_len, row >= local_col)
        # Mosaic cannot select between i1 vectors; compose logically
        mask = jnp.logical_or(
            jnp.logical_and(is_prefix, prefix_mask),
            jnp.logical_and(jnp.logical_not(is_prefix), causal_mask),
        )
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scratch[:, :1]
        l_prev = l_scratch[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)
        pv_out = jax.lax.dot_general(
            p.astype(vblk.dtype), vblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scratch[...] = acc_scratch[...] * alpha + pv_out

    @pl.when(ik == total_blocks - 1)
    def _finalize():
        l = l_scratch[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0, ...] = (acc_scratch[...] / l_safe).astype(o_ref.dtype)


def flash_attention_prefixed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    prefix_k: jnp.ndarray,
    prefix_v: jnp.ndarray,
    *,
    kv_lens: Optional[jnp.ndarray] = None,
    sm_scale: Optional[float] = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """q/k/v: [B, T, H|KH, d] (causal, local positions); prefix_k/v:
    [1, P, KH, d], fully visible to every query row. One fused kernel."""
    B, T, H, d = q.shape
    KH = k.shape[2]
    group = H // KH
    P = prefix_k.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    bq = min(block_q, max(T, 1))
    bk = block_k

    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    pkt = jnp.swapaxes(prefix_k, 1, 2)
    pvt = jnp.swapaxes(prefix_v, 1, 2)
    pad_t = (-T) % bq
    pad_s = (-T) % bk
    pad_p = (-P) % bk
    qt = _pad_bhtd(qt, pad_t)
    kt = _pad_bhtd(kt, pad_s)
    vt = _pad_bhtd(vt, pad_s)
    pkt = _pad_bhtd(pkt, pad_p)
    pvt = _pad_bhtd(pvt, pad_p)
    Tp, Pp = T + pad_t, P + pad_p
    Sp = T + pad_s
    if kv_lens is None:
        kv_lens = jnp.full((B,), T, dtype=jnp.int32)
    kv_lens = jnp.minimum(kv_lens.astype(jnp.int32), T)
    nq = Tp // bq
    npk = Pp // bk
    nk = Sp // bk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, nq, npk + nk),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, h, iq, ik, kv: (b, h, iq, 0)),
            pl.BlockSpec(
                (1, 1, bk, d),
                lambda b, h, iq, ik, kv: (0, h // group, jnp.minimum(ik, npk - 1), 0),
            ),
            pl.BlockSpec(
                (1, 1, bk, d),
                lambda b, h, iq, ik, kv: (0, h // group, jnp.minimum(ik, npk - 1), 0),
            ),
            pl.BlockSpec(
                (1, 1, bk, d),
                lambda b, h, iq, ik, kv: (b, h // group, jnp.clip(ik - npk, 0, nk - 1), 0),
            ),
            pl.BlockSpec(
                (1, 1, bk, d),
                lambda b, h, iq, ik, kv: (b, h // group, jnp.clip(ik - npk, 0, nk - 1), 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b, h, iq, ik, kv: (b, h, iq, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _flash_prefix_kernel, sm_scale=sm_scale, block_q=bq, block_k=bk,
            num_prefix_blocks=npk, num_kv_blocks=nk, prefix_len=P,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lens, qt, pkt, pvt, kt, vt)
    return jnp.swapaxes(out[:, :, :T], 1, 2)


def prefixed_attention_reference(q, k, v, prefix_k, prefix_v, *, kv_lens=None, sm_scale=None):
    """jnp twin of flash_attention_prefixed (CPU path)."""
    B = q.shape[0]
    pk = jnp.broadcast_to(prefix_k, (B,) + prefix_k.shape[1:])
    pv = jnp.broadcast_to(prefix_v, (B,) + prefix_v.shape[1:])
    o1, lse1 = mha_reference_lse(q, pk, pv, causal=False, sm_scale=sm_scale)
    o2, lse2 = mha_reference_lse(q, k, v, causal=True, kv_lens=kv_lens, sm_scale=sm_scale)
    return merge_attention_pieces(o1, lse1, o2, lse2)
