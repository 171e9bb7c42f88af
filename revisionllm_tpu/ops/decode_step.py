"""Fused whole-step decode megakernel.

ONE Pallas program runs the entire L-layer transformer decode step: RMSNorm,
int8-weight q/k/v/o/gate/up/down matmuls with per-channel scales, RoPE,
int8-KV attention over [prompt | generated | self], residuals and SwiGLU —
weights and KV streamed HBM->VMEM with double-buffered async DMA, replacing
the ~224 kernel launches + XLA glue of the scan-based `decode_step_split`
path.

STATUS (measured on v5e, BENCH_NOTES 'megakernel series'): OPT-IN
(REVISIONLLM_MEGAKERNEL=1). The kernel beats the scan path on the matmul
chain (10.8 vs 15.5 ms/step) but its in-kernel attention runs ~27 us per
(row, layer) vs XLA's einsum at 9.6 us, so the full step measures 38 vs
26 ms at B=32. Kept as a correct, parity-tested path with its measurements;
the credible route to <=18 ms is a contiguous-chunk serving weight layout
(shared with prefill) + multi-row attention batching in the freed VMEM.

Parity role: the decode half of the reference's flash-attn monkey patch
(revisionllm/train/llama_flash_attn_monkey_patch.py:19-102) — the hot
per-token path of `sample` (vtimellm_llama.py:287-369) — rebuilt as a single
TPU kernel instead of a CUDA-kernel-per-op pipeline.

Scope (the Vicuna-7B serving config): MHA (H == KH), full-head non-interleaved
rotary, no qkv bias, int8 weights, int8 prompt KV with per-(position, head)
scales, bf16 gen cache. GQA / bias backbones stay on `decode_step_split`.

Design notes
------------
- Grid = (L,), "arbitrary" semantics: TPU executes grid cells sequentially,
  so the residual stream lives in VMEM scratch across layers.
- Weights stream DIRECTLY from the engine's standard {'q8','scale'} stacked
  layout (no repacked copy — a second 7B layout would not fit HBM next to
  the prompt cache): q/k/v/o/gate/up as [D, BN] column chunks (strided DMA,
  512-byte contiguous rows), down as CONTIGUOUS [BF, D] row chunks
  accumulated into a [B, D] f32 buffer — no transposes anywhere. F=11008 is
  handled with a ragged final chunk into a partial buffer slice.
- Attention per batch row b (flat formulation — two big MXU dots instead of
  2*H batched matvecs, amortizing the per-dot fixed cost that killed the
  round-1 standalone kernels, see ops/decode_attention.py):
    scores_all = KV_flat[H*S, hd] (int8) @ q_rows[hd, H] (int8) -> i32,
    diagonal blocks extracted with an identity mask + lane reduction;
    out = blockdiag(softmax * v_scale)[H, H*S] @ V_flat[H*S, hd] (bf16).
  Prompt K and V ride ONE combined array so each row costs one slab DMA.
- Gen-cache: the kernel emits each layer's new k/v as a blocked VMEM output
  (in-kernel single-slot writes would break minor-tile alignment); the host
  wrapper lands all layers into slot `step` with one XLA in-place update.
  The current token's self-attention term is computed from VMEM directly,
  so slab reads never race the cache update.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.0e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Host-side cache packing (weights stream unpacked; only KV gets a layout)
# ---------------------------------------------------------------------------


def pack_prompt_kv(prompt_kv: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Quantized split-cache {'k','k_scale','v','v_scale'} [L,B,S,KH,hd] ->
    megakernel layout: kv [L, B, 2, KH, Sp, hd] int8 (head-major, k/v
    combined so attention pays ONE slab DMA per row; S padded to the int8
    DMA granularity of 128 sublanes) + kvsc [L, B, 2, KH, Sp] f32."""
    k, v = prompt_kv["k"], prompt_kv["v"]
    ks, vs = prompt_kv["k_scale"], prompt_kv["v_scale"]
    L, B, S, KH, hd = k.shape
    # int8 HBM slabs DMA along the S (sublane) dim at 128-row granularity
    Sp = _round_up(S, 128)

    def hm(x):  # [L,B,S,KH,hd] -> [L,B,KH,Sp,hd]
        x = jnp.transpose(x, (0, 1, 3, 2, 4))
        if Sp != S:
            x = jnp.pad(x, ((0, 0),) * 3 + ((0, Sp - S), (0, 0)))
        return x

    def hs(x):  # [L,B,S,KH] -> [L,B,KH,Sp]
        x = jnp.transpose(x, (0, 1, 3, 2))
        if Sp != S:
            x = jnp.pad(x, ((0, 0),) * 3 + ((0, Sp - S),))
        return x

    return {
        "kv": jnp.stack([hm(k), hm(v)], axis=2),
        "kvsc": jnp.stack(
            [hs(ks.astype(jnp.float32)), hs(vs.astype(jnp.float32))], axis=2
        ),
    }


def init_gen_cache(L: int, B: int, KH: int, hd: int, G: int, dtype) -> jnp.ndarray:
    """Megakernel gen cache: one array [L, 2(k,v), B, KH, Gp, hd]."""
    return jnp.zeros((L, 2, B, KH, _round_up(G, 8), hd), dtype)


def supports_megakernel(cfg, params) -> bool:
    """The serving shapes this kernel covers (others use decode_step_split)."""
    if cfg.num_heads != cfg.num_kv_heads or cfg.qkv_bias:
        return False
    if cfg.rope_interleaved or cfg.rope_fraction < 1.0:
        return False
    lp = params["layers"]
    return isinstance(lp.get("q_proj"), dict) and "q8" in lp["q_proj"]


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _chunks(N: int, BN: int):
    """(offset, width) pairs covering N with a ragged tail."""
    out = []
    off = 0
    while off < N:
        w = min(BN, N - off)
        out.append((off, w))
        off += w
    return out


def _decode_kernel(
    # SMEM
    step_ref, plen_ref,
    # VMEM (full)
    x_ref, cos_ref, sin_ref,
    # VMEM per-layer blocks
    anorm_ref, mnorm_ref,
    sq_ref, sk_ref, sv_ref, so_ref, sg_ref, su_ref, sd_ref,
    # ANY (manual DMA)
    wq_ref, wk_ref, wv_ref, wo_ref, wg_ref, wu_ref, wd_ref,
    pkv_ref, kvsc_ref, genkv_in_ref,
    # outputs
    x_out_ref, newkv_ref,
    # scratch
    wbuf, dbuf, kvbuf, scbuf, genbuf,
    xres, qbuf, kbuf, vbuf, attnbuf, mbuf, yacc, qrep, pr1,
    wsem, dsem, kvsem, scsem, gensem,
    *,
    cfg: Dict[str, int],
    eps: float,
):
    l = pl.program_id(0)
    L = pl.num_programs(0)
    B, D, H, hd = cfg["B"], cfg["D"], cfg["H"], cfg["hd"]
    F, BN, BF, Sp, Gp = cfg["F"], cfg["BN"], cfg["BF"], cfg["Sp"], cfg["Gp"]
    step = step_ref[0]
    scale = hd ** -0.5

    @pl.when(l == 0)
    def _():
        xres[...] = x_ref[...]

    # ---------------------------------------------------------------- streams
    def col_dma(ref, off, width, slot):
        """[D, width] column chunk -> wbuf[slot][:, :width]."""
        return pltpu.make_async_copy(
            ref.at[l, :, pl.ds(off, width)],
            wbuf.at[slot, :, pl.ds(0, width)],
            wsem.at[slot],
        )

    def col_stream(refs_and_n, consume):
        """Double-buffered column-chunk stream over one or more matrices.

        refs_and_n: list of (ref, N); the chunk sequence is the concatenation
        over matrices. consume(mat_idx, off, width, w_bf16[D, width])."""
        seq = []
        for mi, (ref, N) in enumerate(refs_and_n):
            for off, width in _chunks(N, BN):
                seq.append((mi, ref, off, width))

        def dma(j, slot):
            _, ref, off, width = seq[j]
            return col_dma(ref, off, width, slot)

        dma(0, 0).start()
        for j, (mi, _, off, width) in enumerate(seq):
            if j + 1 < len(seq):
                dma(j + 1, (j + 1) % 2).start()
            dma(j, j % 2).wait()
            w = wbuf[j % 2, :, pl.ds(0, width)].astype(jnp.bfloat16)
            consume(mi, off, width, w)

    def rmsnorm(x, gamma_ref):
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + eps)) * gamma_ref[0, 0, :].astype(jnp.float32)

    def rope(x):  # [B, H*hd] f32 -> rotated, flat — pure 2D ops:
        # cos/sin arrive pre-expanded to [B, H*hd] (halves duplicated, tiled
        # per head); rotate-half is a static per-head slice concat.
        half = hd // 2
        parts = []
        for h2 in range(H):
            x1 = x[:, h2 * hd : h2 * hd + half]
            x2 = x[:, h2 * hd + half : (h2 + 1) * hd]
            parts.append(-x2)
            parts.append(x1)
        rot = jnp.concatenate(parts, axis=1)
        return x * cos_ref[...] + rot * sin_ref[...]

    # --------------------------------------------------------- 1) qkv + rope
    h_attn = rmsnorm(xres[...], anorm_ref).astype(jnp.bfloat16)  # [B, D]
    qkv_bufs = (qbuf, kbuf, vbuf)
    qkv_scales = (sq_ref, sk_ref, sv_ref)

    def consume_qkv(mi, off, width, w):
        acc = jax.lax.dot_general(
            h_attn, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qkv_bufs[mi][:, pl.ds(off, width)] = (
            acc * qkv_scales[mi][0, 0, pl.ds(off, width)]
        )

    col_stream([(wq_ref, D), (wk_ref, D), (wv_ref, D)], consume_qkv)

    qbuf[...] = rope(qbuf[...])
    kbuf[...] = rope(kbuf[...])

    # --------------------------------------- 2) emit new k/v for this layer
    # (a blocked VMEM output; the host wrapper lands all layers into the gen
    # cache with ONE dynamic_update_slice per step — slicing a single G slot
    # inside the kernel would violate the (8,128) minor-tile alignment)
    newkv_ref[0, 0, ...] = kbuf[...].reshape(B, H, hd).astype(newkv_ref.dtype)
    newkv_ref[0, 1, ...] = vbuf[...].reshape(B, H, hd).astype(newkv_ref.dtype)

    # --------------------------------------------------------- 3) attention
    def kv_dmas(b):
        return (
            pltpu.make_async_copy(pkv_ref.at[l, b], kvbuf.at[b % 2], kvsem.at[b % 2]),
            pltpu.make_async_copy(kvsc_ref.at[l, b], scbuf.at[b % 2], scsem.at[b % 2]),
            pltpu.make_async_copy(
                genkv_in_ref.at[l, :, b], genbuf.at[b % 2], gensem.at[b % 2]
            ),
        )

    for d in kv_dmas(0):
        d.start()

    # 2D-only helpers (Mosaic rejects middle-unit-dim broadcasts; every
    # block-diagonal structure below is built from 2D iotas, static slices
    # and lane concats)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (H, Sp), 1)
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (H, Gp), 1)
    # blockdiag masks on [H, H*X]
    bd_s = (
        jax.lax.broadcasted_iota(jnp.int32, (H, H * Sp), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (H, H * Sp), 1) // Sp
    )
    bd_g = (
        jax.lax.broadcasted_iota(jnp.int32, (H, H * Gp), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (H, H * Gp), 1) // Gp
    )

    def diag_from_flat(s_all, X):
        """[H*X, H] flat cross-head scores -> [H, X] per-head rows: take
        column h of row-block h (static slices + lane concat + transpose)."""
        cols = [
            s_all[h2 * X : (h2 + 1) * X, h2 : h2 + 1] for h2 in range(H)
        ]  # H x [X, 1]
        diagT = jnp.concatenate(cols, axis=1)  # [X, H]
        return jnp.transpose(diagT, (1, 0)).astype(jnp.float32)  # [H, X]

    batched = cfg.get("attn_mode", "batched") == "batched"

    for b in range(B):
        if b + 1 < B:
            for d in kv_dmas(b + 1):
                d.start()
        kv_d, sc_d, gen_d = kv_dmas(b)
        plen = plen_ref[b]

        q_b = qbuf[b : b + 1, :].reshape(H, hd)  # f32 [H, hd]
        kv_d.wait()
        sc_d.wait()
        gen_d.wait()
        ksc = scbuf[b % 2, 0]  # [H, Sp]
        vsc = scbuf[b % 2, 1]

        if batched:
            # ---- batched-over-heads dots: one dot_general per contraction,
            # no flat cross-head matrix, no diag extraction / blockdiag
            # construction (the ~70 small relayout ops of the flat path were
            # ~3x XLA's attention cost; the MXU's per-head fixed cost is
            # cheaper than that op storm). Mosaic requires a non-empty
            # non-contracting dim on both operands, so the q/p vectors ride
            # in row 0 of an 8-row (sublane-tile) staging buffer — rows 1-7
            # hold stale garbage whose outputs are never read.
            qrep[:, 0, :] = q_b.astype(jnp.bfloat16)
            k_slab = kvbuf[b % 2, 0].astype(jnp.bfloat16)  # [H, Sp, hd]
            s1_all = jax.lax.dot_general(
                qrep[...], k_slab, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [H, 8, Sp]
            s1 = s1_all[:, 0, :] * ksc * scale
            s1 = jnp.where(s_iota < plen, s1, NEG_INF)
            # gen side stays FLAT: its Gp=16 lane dims are below the native
            # 128 and hit unsupported relayouts in the batched form
            gk_flat = genbuf[b % 2, 0].reshape(H * Gp, hd).astype(jnp.bfloat16)
            g_all = jax.lax.dot_general(
                gk_flat, jnp.transpose(q_b.astype(jnp.bfloat16), (1, 0)),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [H*Gp, H]
            s2 = diag_from_flat(g_all, Gp) * scale
            s2 = jnp.where(g_iota < step, s2, NEG_INF)
        else:
            # ---- flat formulation (kept selectable; see BENCH_NOTES)
            qmax = jnp.max(jnp.abs(q_b), axis=-1, keepdims=True)
            qsc = jnp.where(qmax > 0, qmax / 127.0, 1.0)  # [H, 1]
            q_i8 = jnp.clip(jnp.round(q_b / qsc), -127, 127).astype(jnp.int8)
            k_flat = kvbuf[b % 2, 0].reshape(H * Sp, hd)  # int8
            s_all = jax.lax.dot_general(
                k_flat, jnp.transpose(q_i8, (1, 0)), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [H*Sp, H]
            s1 = diag_from_flat(s_all, Sp) * ksc * (qsc * scale)
            s1 = jnp.where(s_iota < plen, s1, NEG_INF)
            gk_flat = genbuf[b % 2, 0].reshape(H * Gp, hd).astype(jnp.bfloat16)
            g_all = jax.lax.dot_general(
                gk_flat, jnp.transpose(q_b.astype(jnp.bfloat16), (1, 0)),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [H*Gp, H]
            s2 = diag_from_flat(g_all, Gp) * scale
            s2 = jnp.where(g_iota < step, s2, NEG_INF)

        k_new = kbuf[b : b + 1, :].reshape(H, hd)
        s_self = jnp.sum(q_b * k_new, axis=-1, keepdims=True) * scale

        # ---- softmax over [prompt | gen | self]
        m = jnp.maximum(
            jnp.maximum(
                jnp.max(s1, axis=-1, keepdims=True),
                jnp.max(s2, axis=-1, keepdims=True),
            ),
            s_self,
        )
        p1 = jnp.exp(s1 - m)
        p2 = jnp.exp(s2 - m)
        ps = jnp.exp(s_self - m)
        denom = (
            jnp.sum(p1, axis=-1, keepdims=True)
            + jnp.sum(p2, axis=-1, keepdims=True)
            + ps
        )

        p1v = (p1 * vsc).astype(jnp.bfloat16)  # [H, Sp]
        p2b = p2.astype(jnp.bfloat16)
        if batched:
            pr1[:, 0, :] = p1v
            v_slab = kvbuf[b % 2, 1].astype(jnp.bfloat16)  # [H, Sp, hd]
            o1_all = jax.lax.dot_general(
                pr1[...], v_slab, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [H, 8, hd]
            o1 = o1_all[:, 0, :]
            pbd2 = jnp.where(
                bd_g, jnp.concatenate([p2b] * H, axis=1), jnp.bfloat16(0.0)
            )  # [H, H*Gp]
            gv_flat = genbuf[b % 2, 1].reshape(H * Gp, hd).astype(jnp.bfloat16)
            o2 = jax.lax.dot_general(
                pbd2, gv_flat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [H, hd]
        else:
            pbd = jnp.where(
                bd_s, jnp.concatenate([p1v] * H, axis=1), jnp.bfloat16(0.0)
            )  # [H, H*Sp]
            v_flat = kvbuf[b % 2, 1].reshape(H * Sp, hd).astype(jnp.bfloat16)
            o1 = jax.lax.dot_general(
                pbd, v_flat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [H, hd]
            pbd2 = jnp.where(
                bd_g, jnp.concatenate([p2b] * H, axis=1), jnp.bfloat16(0.0)
            )  # [H, H*Gp]
            gv_flat = genbuf[b % 2, 1].reshape(H * Gp, hd).astype(jnp.bfloat16)
            o2 = jax.lax.dot_general(
                pbd2, gv_flat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o3 = ps * vbuf[b : b + 1, :].reshape(H, hd)
        o = (o1 + o2 + o3) / denom
        attnbuf[b : b + 1, :] = o.reshape(1, H * hd)

    # --------------------------------------------------------- 4) o_proj
    attn_bf = attnbuf[...].astype(jnp.bfloat16)

    def consume_o(mi, off, width, w):
        acc = jax.lax.dot_general(
            attn_bf, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sl = pl.ds(off, width)
        xres[:, sl] = (
            xres[:, sl].astype(jnp.float32) + acc * so_ref[0, 0, sl]
        ).astype(xres.dtype)

    col_stream([(wo_ref, D)], consume_o)

    # --------------------------------------------------------- 5) MLP
    h_mlp = rmsnorm(xres[...], mnorm_ref).astype(jnp.bfloat16)

    def consume_gu(mi, off, width, w):
        sl = pl.ds(off, width)
        if mi == 0:
            g = jax.lax.dot_general(
                h_mlp, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sg_ref[0, 0, sl]
            # stash silu(g) until the up chunk lands (materializes the dot,
            # freeing the shared weight buffer slot)
            mbuf[:, sl] = (g * jax.nn.sigmoid(g)).astype(mbuf.dtype)
        else:
            u = jax.lax.dot_general(
                h_mlp, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * su_ref[0, 0, sl]
            mbuf[:, sl] = (mbuf[:, sl].astype(jnp.float32) * u).astype(mbuf.dtype)

    # interleave gate/up per column chunk so each silu(g) pairs with its u
    gu_seq = []
    for off, width in _chunks(F, BN):
        gu_seq.append((wg_ref, off, width, 0))
        gu_seq.append((wu_ref, off, width, 1))

    def gu_dma(j, slot):
        ref, off, width, _ = gu_seq[j]
        return col_dma(ref, off, width, slot)

    gu_dma(0, 0).start()
    for j, (_, off, width, mi) in enumerate(gu_seq):
        if j + 1 < len(gu_seq):
            gu_dma(j + 1, (j + 1) % 2).start()
        gu_dma(j, j % 2).wait()
        w = wbuf[j % 2, :, pl.ds(0, width)].astype(jnp.bfloat16)
        consume_gu(mi, off, width, w)

    # down: contiguous [BF, D] row chunks, accumulated in f32
    def d_dma(j, slot, off, width):
        return pltpu.make_async_copy(
            wd_ref.at[l, pl.ds(off, width), :],
            dbuf.at[slot, pl.ds(0, width), :],
            dsem.at[slot],
        )

    d_seq = _chunks(F, BF)
    d_dma(0, 0, *d_seq[0]).start()
    for j, (off, width) in enumerate(d_seq):
        if j + 1 < len(d_seq):
            d_dma(j + 1, (j + 1) % 2, *d_seq[j + 1]).start()
        d_dma(j, j % 2, off, width).wait()
        w = dbuf[j % 2, pl.ds(0, width), :].astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            mbuf[:, pl.ds(off, width)], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, D]
        if j == 0:
            yacc[...] = part
        else:
            yacc[...] = yacc[...] + part

    y = yacc[...] * sd_ref[0, 0, :]
    xres[...] = (xres[...].astype(jnp.float32) + y).astype(xres.dtype)

    @pl.when(l == L - 1)
    def _():
        x_out_ref[...] = xres[...]


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "block_n", "block_f", "attn_mode"))
def decode_step_fused(
    params: Dict[str, Any],
    pkv: Dict[str, Any],
    genkv: jnp.ndarray,
    prompt_lens: jnp.ndarray,
    step: jnp.ndarray,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    eps: float = 1e-5,
    interpret: bool = False,
    block_n: int = 1024,
    block_f: int = 1024,
    attn_mode: str = "batched",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused decode step from the engine's standard quantized tree.

    x [B, D] (current token hidden, pre-layer-0); cos/sin [B, hd//2] f32 for
    each row's position. Returns (hidden [B, D] — final norm + lm_head run
    outside — and the updated genkv)."""
    layers = params["layers"]
    wq = layers["q_proj"]["q8"]
    L, D, _ = wq.shape
    F = layers["gate_proj"]["q8"].shape[-1]
    B = x.shape[0]
    Lk, Bk, two, H, Sp, hd = pkv["kv"].shape
    Gp = genkv.shape[4]
    BN = min(block_n, D)
    BF = min(block_f, F)
    cfg = dict(B=B, D=D, H=H, hd=hd, F=F, BN=BN, BF=BF, Sp=Sp, Gp=Gp, attn_mode=attn_mode)

    kernel = functools.partial(_decode_kernel, cfg=cfg, eps=eps)

    out_shapes = (
        jax.ShapeDtypeStruct((B, D), x.dtype),
        jax.ShapeDtypeStruct((L, 2, B, H, hd), genkv.dtype),  # new k/v per layer
    )

    def scale_f32(name):
        return layers[name]["scale"].astype(jnp.float32)[:, None, :]

    # pre-expand rotary angles to the flat head layout the kernel uses
    # (pure-2D rope: halves duplicated, tiled across heads)
    cos_full = jnp.tile(jnp.concatenate([cos, cos], axis=1), (1, H))
    sin_full = jnp.tile(jnp.concatenate([sin, sin], axis=1), (1, H))

    hidden, genkv_out = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # step [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),      # prompt_lens [B]
            pl.BlockSpec(memory_space=pltpu.VMEM),      # x
            pl.BlockSpec(memory_space=pltpu.VMEM),      # cos
            pl.BlockSpec(memory_space=pltpu.VMEM),      # sin
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0)),  # attn_norm
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0)),  # mlp_norm
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0)),  # sq
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0)),  # sk
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0)),  # sv
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0)),  # so
            pl.BlockSpec((1, 1, F), lambda l: (l, 0, 0)),  # sg
            pl.BlockSpec((1, 1, F), lambda l: (l, 0, 0)),  # su
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0)),  # sd
            pl.BlockSpec(memory_space=pltpu.HBM),       # wq
            pl.BlockSpec(memory_space=pltpu.HBM),       # wk
            pl.BlockSpec(memory_space=pltpu.HBM),       # wv
            pl.BlockSpec(memory_space=pltpu.HBM),       # wo
            pl.BlockSpec(memory_space=pltpu.HBM),       # wg
            pl.BlockSpec(memory_space=pltpu.HBM),       # wu
            pl.BlockSpec(memory_space=pltpu.HBM),       # wd
            pl.BlockSpec(memory_space=pltpu.HBM),       # pkv
            pl.BlockSpec(memory_space=pltpu.HBM),       # kvsc
            pl.BlockSpec(memory_space=pltpu.HBM),       # genkv (in)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, B, H, hd), lambda l: (l, 0, 0, 0, 0)),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, D, BN), jnp.int8),           # wbuf
            pltpu.VMEM((2, BF, D), jnp.int8),           # dbuf
            pltpu.VMEM((2, 2, H, Sp, hd), jnp.int8),    # kvbuf
            pltpu.VMEM((2, 2, H, Sp), jnp.float32),     # scbuf
            pltpu.VMEM((2, 2, H, Gp, hd), genkv.dtype), # genbuf
            pltpu.VMEM((B, D), x.dtype),                # xres
            pltpu.VMEM((B, H * hd), jnp.float32),       # qbuf
            pltpu.VMEM((B, H * hd), jnp.float32),       # kbuf
            pltpu.VMEM((B, H * hd), jnp.float32),       # vbuf
            pltpu.VMEM((B, D), jnp.float32),            # attnbuf
            pltpu.VMEM((B, F), jnp.bfloat16),           # mbuf
            pltpu.VMEM((B, D), jnp.float32),            # yacc
            pltpu.VMEM((H, 8, hd), jnp.bfloat16),       # qrep (row 0 live)
            pltpu.VMEM((H, 8, Sp), jnp.bfloat16),       # pr1 (row 0 live)
            pltpu.SemaphoreType.DMA((2,)),              # wsem
            pltpu.SemaphoreType.DMA((2,)),              # dsem
            pltpu.SemaphoreType.DMA((2,)),              # kvsem
            pltpu.SemaphoreType.DMA((2,)),              # scsem
            pltpu.SemaphoreType.DMA((2,)),              # gensem
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        step.reshape(1).astype(jnp.int32),
        prompt_lens.astype(jnp.int32),
        x,
        cos_full,
        sin_full,
        layers["attn_norm"].astype(jnp.float32)[:, None, :],
        layers["mlp_norm"].astype(jnp.float32)[:, None, :],
        scale_f32("q_proj"), scale_f32("k_proj"), scale_f32("v_proj"),
        scale_f32("o_proj"), scale_f32("gate_proj"), scale_f32("up_proj"),
        scale_f32("down_proj"),
        layers["q_proj"]["q8"], layers["k_proj"]["q8"], layers["v_proj"]["q8"],
        layers["o_proj"]["q8"], layers["gate_proj"]["q8"],
        layers["up_proj"]["q8"], layers["down_proj"]["q8"],
        pkv["kv"], pkv["kvsc"],
        genkv,
    )
    # land this step's k/v into slot `step` (one XLA in-place update;
    # genkv_out here is the [L, 2, B, H, hd] per-layer new-kv stack)
    genkv = jax.lax.dynamic_update_slice(
        genkv, genkv_out[:, :, :, :, None, :],
        (0, 0, 0, 0, step.astype(jnp.int32), 0),
    )
    return hidden, genkv
