"""Serving-layout fused decode step (megakernel v2).

The round-2 megakernel (ops/decode_step.py) measured 38.2 ms/step vs the
26.4 ms scan path and left two measured bounds (BENCH_NOTES 'megakernel
series'): weight streaming from the standard [L, D, N] layout pays a
strided-DMA tax (10.8 ms vs the 7.7 ms contiguous floor), and the per-row
attention loop costs ~27 us/(row, layer) — an op storm of small relayouts
(diag extraction, blockdiag builds, 8-row stagings) that XLA's einsum does
in 9.6 us. This kernel removes both:

1. CONTIGUOUS PRE-CHUNKED WEIGHTS (`pack_serving_weights`): every layer
   matrix is stored as [L, nc, D, BN] column blocks (down_proj as
   [L, ncf, BF, D] row blocks), so each double-buffered DMA moves one fully
   contiguous block. The packed layout REPLACES the standard tree (HBM
   cannot hold two 7B copies next to the prompt cache); prefill consumes it
   through the chunked path in ops.quant.q8_apply.

2. UNIFIED KV SLAB: generated tokens are quantized host-side and landed
   INTO the prompt slab at a fixed static offset S0 (the 128-sublane DMA
   padding of Sp leaves headroom: S0 + G <= Sp). The separate bf16 gen
   cache — and with it the per-row gen DMAs, flat cross-head dots, and
   diagonal extraction that dominated the old kernel's op count — is gone.
   Attention is ONE batched dot over [prompt | gen] with a two-range mask.

3. MULTI-ROW ATTENTION BATCHING: nb rows ride one slab DMA and one pair of
   batched dot_generals (batch dim nb*H), amortizing the fixed per-call
   cost ~nb-fold. VMEM budget at nb=4, Sp=384: ~25 MB KV double-buffer +
   16 MB weight buffers — inside the ~45 MB measured v5e scratch headroom.

Parity role: the decode half of the reference's flash-attn monkey patch
(revisionllm/train/llama_flash_attn_monkey_patch.py:19-102), i.e. the hot
per-token path of `sample` (revisionllm/model/vtimellm_llama.py:287-369),
rebuilt as a single TPU Pallas program over the serving weight layout.

Scope (the Vicuna-7B serving config): MHA (H == KH), full-head
non-interleaved rotary, no qkv bias, int8 weights, int8 unified KV with
per-(position, head) scales. GQA / bias backbones use decode_step_split.
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
# Host-side packing: weights and the unified KV slab
# ---------------------------------------------------------------------------

COL_MATS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj")


def pack_serving_weights(
    layers: Dict[str, Any], block_n: int = 1024, block_f: int = 1024
) -> Dict[str, Any]:
    """Standard stacked quantized layer tree -> contiguous serving chunks.

    q/k/v/o/gate/up [L, D, N] int8 -> {"q8c": [L, nc, D, BN] int8,
    "scale": [L, Np] f32} with N zero-padded to Np = nc*BN (zero scale =>
    padded outputs are exactly 0). down_proj [L, F, D] -> {"q8r":
    [L, ncf, BF, D], "scale": [L, D]} row chunks (F zero-padded; zero rows
    contribute nothing to the accumulation). Norm vectors pass through.
    """
    import math

    # gate/up columns and down rows must pad to the SAME Fp so the kernel's
    # [B, Fp] activation buffer lines up with both streams
    f_pad = math.lcm(block_n, block_f)
    out: Dict[str, Any] = {}
    for name in COL_MATS:
        w = layers[name]["q8"]
        s = layers[name]["scale"]
        L, D, N = w.shape
        Np = _round_up(N, f_pad if name in ("gate_proj", "up_proj") else block_n)
        nc = Np // block_n
        if Np != N:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, Np - N)))
            s = jnp.pad(s, ((0, 0), (0, Np - N)))
        out[name] = {
            "q8c": jnp.transpose(
                w.reshape(L, D, nc, block_n), (0, 2, 1, 3)
            ),  # [L, nc, D, BN]
            "scale": s.astype(jnp.float32),
        }
    wd = layers["down_proj"]["q8"]
    sd = layers["down_proj"]["scale"]
    L, F, D = wd.shape
    Fp = _round_up(F, f_pad)
    if Fp != F:
        wd = jnp.pad(wd, ((0, 0), (0, Fp - F), (0, 0)))
    out["down_proj"] = {
        "q8r": wd.reshape(L, Fp // block_f, block_f, D),  # [L, ncf, BF, D]
        "scale": sd.astype(jnp.float32),
    }
    for name, v in layers.items():
        if name not in out:
            out[name] = v
    return out


def unpack_serving_weights(packed: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of pack_serving_weights (materializes the standard layout —
    test/conversion use only; a full 7B unpack doubles weight HBM)."""
    out: Dict[str, Any] = {}
    for name in COL_MATS:
        wc = packed[name]["q8c"]
        s = packed[name]["scale"]
        L, nc, D, BN = wc.shape
        w = jnp.transpose(wc, (0, 2, 1, 3)).reshape(L, D, nc * BN)
        # trailing padded columns have zero scale; callers slice N as needed
        out[name] = {"q8": w, "scale": s}
    wd = packed["down_proj"]["q8r"]
    L, ncf, BF, D = wd.shape
    out["down_proj"] = {
        "q8r_unpacked": wd.reshape(L, ncf * BF, D),
        "scale": packed["down_proj"]["scale"],
    }
    for name in ("attn_norm", "mlp_norm"):
        out[name] = packed[name]
    return out


def pack_unified_kv(
    prompt_kv: Dict[str, jnp.ndarray], gen_slots: int
) -> Tuple[Dict[str, jnp.ndarray], int]:
    """Quantized split prompt cache {'k','k_scale','v','v_scale'}
    [L, B, S, KH, hd] -> unified serving slab:

      kv   [L, B, 2, KH, Sp, hd] int8   (head-major, k/v combined)
      kvsc [L, B, 2, KH, Sp]     f32

    with Sp = round_up(S + gen_slots, 128) (int8 slab DMA needs 128-sublane
    granularity on the sliced dim). Returns (slab, S0) where S0 = S is the
    STATIC write offset for generated tokens: step g lands at Sp-index
    S0 + g for every row, regardless of its ragged prompt length (rows mask
    [plen, S0) as dead).
    """
    k, v = prompt_kv["k"], prompt_kv["v"]
    ks, vs = prompt_kv["k_scale"], prompt_kv["v_scale"]
    L, B, S, KH, hd = k.shape
    Sp = _round_up(S + gen_slots, 128)

    def hm(x):  # [L,B,S,KH,hd] -> [L,B,KH,Sp,hd]
        x = jnp.transpose(x, (0, 1, 3, 2, 4))
        return jnp.pad(x, ((0, 0),) * 3 + ((0, Sp - S), (0, 0)))

    def hs(x):  # [L,B,S,KH] -> [L,B,KH,Sp]
        x = jnp.transpose(x, (0, 1, 3, 2))
        return jnp.pad(x, ((0, 0),) * 3 + ((0, Sp - S),))

    slab = {
        "kv": jnp.stack([hm(k), hm(v)], axis=2),
        "kvsc": jnp.stack(
            [hs(ks.astype(jnp.float32)), hs(vs.astype(jnp.float32))], axis=2
        ),
    }
    return slab, S


def land_new_kv(
    slab: Dict[str, jnp.ndarray],
    newkv: jnp.ndarray,
    s0: int,
    step: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Quantize this step's k/v (newkv [L, 2, B, KH, hd] float) and write
    them into the unified slab at Sp-index s0 + step (one pair of in-place
    dynamic_update_slices on the scan-carried slab)."""
    xf = newkv.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)  # [L,2,B,KH,1]
    sc = jnp.where(absmax > 0.0, absmax / 127.0, 1.0)
    q8 = jnp.clip(jnp.round(xf / sc), -127, 127).astype(jnp.int8)
    # [L,2,B,KH,hd] -> [L,B,2,KH,1,hd]
    q8 = jnp.transpose(q8, (0, 2, 1, 3, 4))[:, :, :, :, None, :]
    scv = jnp.transpose(sc[..., 0], (0, 2, 1, 3))[:, :, :, :, None]  # [L,B,2,KH,1]
    idx = s0 + step.astype(jnp.int32)
    kv = jax.lax.dynamic_update_slice(slab["kv"], q8, (0, 0, 0, 0, idx, 0))
    kvsc = jax.lax.dynamic_update_slice(slab["kvsc"], scv, (0, 0, 0, 0, idx))
    return {"kv": kv, "kvsc": kvsc}


def supports_serve(cfg, params_or_packed) -> bool:
    """Shapes this kernel covers (others use decode_step_split)."""
    if cfg.num_heads != cfg.num_kv_heads or cfg.qkv_bias:
        return False
    if cfg.rope_interleaved or cfg.rope_fraction < 1.0:
        return False
    lp = params_or_packed.get("layers", params_or_packed)
    qp = lp.get("q_proj")
    if not (isinstance(qp, dict) and ("q8c" in qp or "q8" in qp)):
        return False
    # consume_qkv writes q/k/v/o into a [B, D] buffer in block_n chunks:
    # D must tile exactly (Np == N), or the last chunk writes out of range.
    if "q8c" in qp:
        _, ncD, D, BN = qp["q8c"].shape
        if ncD * BN != D:
            return False
    return True


def _chunks(N: int, BN: int):
    out = []
    off = 0
    while off < N:
        w = min(BN, N - off)
        out.append((off, w))
        off += w
    return out


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _serve_kernel(
    # SMEM
    step_ref, plen_ref,
    # VMEM (full)
    x_ref, cos_ref, sin_ref,
    # VMEM per-layer blocks
    anorm_ref, mnorm_ref,
    sq_ref, sk_ref, sv_ref, so_ref, sg_ref, su_ref, sd_ref,
    # ANY (manual DMA) — contiguous chunk arrays
    wq_ref, wk_ref, wv_ref, wo_ref, wg_ref, wu_ref, wd_ref,
    kv_ref, kvsc_ref,
    # outputs
    x_out_ref, newkv_ref,
    # scratch
    wbuf, dbuf, kvbuf, scbuf,
    xres, qbuf, kbuf, vbuf, attnbuf, mbuf, yacc, qrep, pr1,
    wsem, dsem, kvsem, scsem,
    *,
    cfg: Dict[str, int],
    eps: float,
):
    l = pl.program_id(0)
    L = pl.num_programs(0)
    B, D, H, hd = cfg["B"], cfg["D"], cfg["H"], cfg["hd"]
    Fp, BN, BF, Sp = cfg["Fp"], cfg["BN"], cfg["BF"], cfg["Sp"]
    S0, nb = cfg["S0"], cfg["nb"]
    NG = B // nb
    step = step_ref[0]
    scale = hd ** -0.5

    @pl.when(l == 0)
    def _():
        xres[...] = x_ref[...]

    # ------------------------------------------------------------- streams
    def chunk_dma(ref, j, slot):
        """Contiguous [D, BN] chunk j of matrix `ref` -> wbuf[slot]."""
        return pltpu.make_async_copy(ref.at[l, j], wbuf.at[slot], wsem.at[slot])

    def col_stream(refs_and_nc, consume):
        """Double-buffered contiguous-chunk stream over one or more packed
        matrices. consume(mat_idx, chunk_idx, w_bf16 [D, BN])."""
        seq = []
        for mi, (ref, nc) in enumerate(refs_and_nc):
            for j in range(nc):
                seq.append((mi, ref, j))

        def dma(i, slot):
            _, ref, j = seq[i]
            return chunk_dma(ref, j, slot)

        dma(0, 0).start()
        for i, (mi, _, j) in enumerate(seq):
            if i + 1 < len(seq):
                dma(i + 1, (i + 1) % 2).start()
            dma(i, i % 2).wait()
            consume(mi, j, wbuf[i % 2].astype(jnp.bfloat16))

    def rmsnorm(x, gamma_ref):
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + eps)) * gamma_ref[0, 0, :].astype(jnp.float32)

    def rope(x):  # [B, H*hd] f32, pure-2D rotate-half (pre-expanded angles)
        half = hd // 2
        parts = []
        for h2 in range(H):
            x1 = x[:, h2 * hd : h2 * hd + half]
            x2 = x[:, h2 * hd + half : (h2 + 1) * hd]
            parts.append(-x2)
            parts.append(x1)
        rot = jnp.concatenate(parts, axis=1)
        return x * cos_ref[...] + rot * sin_ref[...]

    # ------------------------------------------------------- 1) qkv + rope
    h_attn = rmsnorm(xres[...], anorm_ref).astype(jnp.bfloat16)  # [B, D]
    qkv_bufs = (qbuf, kbuf, vbuf)
    qkv_scales = (sq_ref, sk_ref, sv_ref)

    def consume_qkv(mi, j, w):
        acc = jax.lax.dot_general(
            h_attn, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sl = pl.ds(j * BN, BN)
        qkv_bufs[mi][:, sl] = acc * qkv_scales[mi][0, 0, sl]

    ncD = D // BN
    col_stream([(wq_ref, ncD), (wk_ref, ncD), (wv_ref, ncD)], consume_qkv)

    qbuf[...] = rope(qbuf[...])
    kbuf[...] = rope(kbuf[...])

    # ------------------------------------------- 2) emit new k/v (blocked
    # output; the host quantizes and lands them into the unified slab)
    newkv_ref[0, 0, ...] = kbuf[...].reshape(B, H, hd).astype(newkv_ref.dtype)
    newkv_ref[0, 1, ...] = vbuf[...].reshape(B, H, hd).astype(newkv_ref.dtype)

    # ------------------------------------------------------- 3) attention
    # nb rows per iteration: ONE contiguous slab DMA ([nb, 2, H, Sp, hd]),
    # ONE batched score dot and ONE batched output dot with batch dim nb*H.
    def kv_dmas(g):
        return (
            pltpu.make_async_copy(
                kv_ref.at[l, pl.ds(g * nb, nb)], kvbuf.at[g % 2], kvsem.at[g % 2]
            ),
            pltpu.make_async_copy(
                kvsc_ref.at[l, pl.ds(g * nb, nb)], scbuf.at[g % 2], scsem.at[g % 2]
            ),
        )

    for d in kv_dmas(0):
        d.start()

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (nb * H, Sp), 1)

    for g in range(NG):
        if g + 1 < NG:
            for d in kv_dmas(g + 1):
                d.start()
        kv_d, sc_d = kv_dmas(g)
        b0 = g * nb

        q_g = qbuf[b0 : b0 + nb, :].reshape(nb * H, hd)  # f32
        kv_d.wait()
        sc_d.wait()

        # [plen | dead | gen) mask: prompt rows [0, plen_b), generated
        # tokens at the STATIC offset [S0, S0 + step)
        plen_col = jnp.concatenate(
            [jnp.full((H, 1), plen_ref[b0 + i], jnp.int32) for i in range(nb)],
            axis=0,
        )  # [nb*H, 1]
        valid = (s_iota < plen_col) | ((s_iota >= S0) & (s_iota < S0 + step))

        qrep[:, 0, :] = q_g.astype(jnp.bfloat16)
        k_slab = kvbuf[g % 2, :, 0].reshape(nb * H, Sp, hd).astype(jnp.bfloat16)
        s1_all = jax.lax.dot_general(
            qrep[...], k_slab, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [nb*H, 8, Sp]
        ksc = scbuf[g % 2, :, 0].reshape(nb * H, Sp)
        s1 = s1_all[:, 0, :] * ksc * scale
        s1 = jnp.where(valid, s1, NEG_INF)

        k_new = kbuf[b0 : b0 + nb, :].reshape(nb * H, hd)
        s_self = jnp.sum(q_g * k_new, axis=-1, keepdims=True) * scale

        m = jnp.maximum(jnp.max(s1, axis=-1, keepdims=True), s_self)
        p1 = jnp.exp(s1 - m)
        ps = jnp.exp(s_self - m)
        denom = jnp.sum(p1, axis=-1, keepdims=True) + ps

        vsc = scbuf[g % 2, :, 1].reshape(nb * H, Sp)
        pr1[:, 0, :] = (p1 * vsc).astype(jnp.bfloat16)
        v_slab = kvbuf[g % 2, :, 1].reshape(nb * H, Sp, hd).astype(jnp.bfloat16)
        o1_all = jax.lax.dot_general(
            pr1[...], v_slab, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [nb*H, 8, hd]
        o1 = o1_all[:, 0, :]
        o3 = ps * vbuf[b0 : b0 + nb, :].reshape(nb * H, hd)
        o = (o1 + o3) / denom
        attnbuf[b0 : b0 + nb, :] = o.reshape(nb, H * hd)

    # -------------------------------------------------------- 4) o_proj
    attn_bf = attnbuf[...].astype(jnp.bfloat16)

    def consume_o(mi, j, w):
        acc = jax.lax.dot_general(
            attn_bf, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sl = pl.ds(j * BN, BN)
        xres[:, sl] = (
            xres[:, sl].astype(jnp.float32) + acc * so_ref[0, 0, sl]
        ).astype(xres.dtype)

    col_stream([(wo_ref, ncD)], consume_o)

    # ----------------------------------------------------------- 5) MLP
    h_mlp = rmsnorm(xres[...], mnorm_ref).astype(jnp.bfloat16)
    ncF = Fp // BN

    def consume_gu(mi, j, w):
        sl = pl.ds(j * BN, BN)
        if mi == 0:
            g = jax.lax.dot_general(
                h_mlp, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sg_ref[0, 0, sl]
            mbuf[:, sl] = (g * jax.nn.sigmoid(g)).astype(mbuf.dtype)
        else:
            u = jax.lax.dot_general(
                h_mlp, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * su_ref[0, 0, sl]
            mbuf[:, sl] = (mbuf[:, sl].astype(jnp.float32) * u).astype(mbuf.dtype)

    # interleave gate/up per chunk so each silu(g) pairs with its u
    gu_seq = []
    for j in range(ncF):
        gu_seq.append((wg_ref, j, 0))
        gu_seq.append((wu_ref, j, 1))

    def gu_dma(i, slot):
        ref, j, _ = gu_seq[i]
        return chunk_dma(ref, j, slot)

    gu_dma(0, 0).start()
    for i, (_, j, mi) in enumerate(gu_seq):
        if i + 1 < len(gu_seq):
            gu_dma(i + 1, (i + 1) % 2).start()
        gu_dma(i, i % 2).wait()
        consume_gu(mi, j, wbuf[i % 2].astype(jnp.bfloat16))

    # down: contiguous [BF, D] row chunks accumulated in f32
    ncfd = Fp // BF

    def d_dma(j, slot):
        return pltpu.make_async_copy(wd_ref.at[l, j], dbuf.at[slot], dsem.at[slot])

    d_dma(0, 0).start()
    for j in range(ncfd):
        if j + 1 < ncfd:
            d_dma(j + 1, (j + 1) % 2).start()
        d_dma(j, j % 2).wait()
        w = dbuf[j % 2].astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            mbuf[:, pl.ds(j * BF, BF)], w, (((1,), (0,)), ((), ())),
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


@functools.partial(
    jax.jit,
    static_argnames=("s0", "eps", "interpret", "nb"),
)
def decode_step_serve(
    packed: Dict[str, Any],
    slab: Dict[str, jnp.ndarray],
    prompt_lens: jnp.ndarray,
    step: jnp.ndarray,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    s0: int,
    eps: float = 1e-5,
    interpret: bool = False,
    nb: int = 4,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One fused decode step over the packed serving layout + unified slab.

    x [B, D] current-token hidden (pre-layer-0); cos/sin [B, hd//2] f32 at
    each row's logical position. Returns (hidden [B, D] — final norm and
    lm_head run outside — and the slab with this step's k/v landed at
    s0 + step)."""
    wq = packed["q_proj"]["q8c"]
    L, ncD, D, BN = wq.shape
    if ncD * BN != D:
        raise ValueError(
            f"decode_step_serve: hidden size {D} not a multiple of block_n "
            f"{BN} — consume_qkv would write out of range (use the scan path)"
        )
    _, ncF, _, _ = packed["gate_proj"]["q8c"].shape
    _, ncfd, BF, _ = packed["down_proj"]["q8r"].shape
    Fp = ncF * BN
    B = x.shape[0]
    _, Bk, two, H, Sp, hd = slab["kv"].shape
    if B % nb != 0:
        nb = 1
    cfg = dict(
        B=B, D=D, H=H, hd=hd, Fp=Fp, BN=BN, BF=BF, Sp=Sp, S0=s0, nb=nb
    )
    kernel = functools.partial(_serve_kernel, cfg=cfg, eps=eps)

    out_shapes = (
        jax.ShapeDtypeStruct((B, D), x.dtype),
        jax.ShapeDtypeStruct((L, 2, B, H, hd), jnp.float32),
    )

    def scale_f32(name):
        return packed[name]["scale"].astype(jnp.float32)[:, None, :]

    cos_full = jnp.tile(jnp.concatenate([cos, cos], axis=1), (1, H))
    sin_full = jnp.tile(jnp.concatenate([sin, sin], axis=1), (1, H))

    hidden, newkv = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # step [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),      # prompt_lens [B]
            pl.BlockSpec(memory_space=pltpu.VMEM),      # x
            pl.BlockSpec(memory_space=pltpu.VMEM),      # cos
            pl.BlockSpec(memory_space=pltpu.VMEM),      # sin
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0)),   # attn_norm
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0)),   # mlp_norm
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0)),   # sq
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0)),   # sk
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0)),   # sv
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0)),   # so
            pl.BlockSpec((1, 1, Fp), lambda l: (l, 0, 0)),  # sg
            pl.BlockSpec((1, 1, Fp), lambda l: (l, 0, 0)),  # su
            pl.BlockSpec((1, 1, D), lambda l: (l, 0, 0)),   # sd
            pl.BlockSpec(memory_space=pl.ANY),       # wq
            pl.BlockSpec(memory_space=pl.ANY),       # wk
            pl.BlockSpec(memory_space=pl.ANY),       # wv
            pl.BlockSpec(memory_space=pl.ANY),       # wo
            pl.BlockSpec(memory_space=pl.ANY),       # wg
            pl.BlockSpec(memory_space=pl.ANY),       # wu
            pl.BlockSpec(memory_space=pl.ANY),       # wd
            pl.BlockSpec(memory_space=pl.ANY),       # kv
            pl.BlockSpec(memory_space=pl.ANY),       # kvsc
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, B, H, hd), lambda l: (l, 0, 0, 0, 0)),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, D, BN), jnp.int8),               # wbuf
            pltpu.VMEM((2, BF, D), jnp.int8),               # dbuf
            pltpu.VMEM((2, nb, 2, H, Sp, hd), jnp.int8),    # kvbuf
            pltpu.VMEM((2, nb, 2, H, Sp), jnp.float32),     # scbuf
            pltpu.VMEM((B, D), x.dtype),                    # xres
            pltpu.VMEM((B, H * hd), jnp.float32),           # qbuf
            pltpu.VMEM((B, H * hd), jnp.float32),           # kbuf
            pltpu.VMEM((B, H * hd), jnp.float32),           # vbuf
            pltpu.VMEM((B, D), jnp.float32),                # attnbuf
            pltpu.VMEM((B, Fp), jnp.bfloat16),              # mbuf
            pltpu.VMEM((B, D), jnp.float32),                # yacc
            pltpu.VMEM((nb * H, 8, hd), jnp.bfloat16),      # qrep (row 0)
            pltpu.VMEM((nb * H, 8, Sp), jnp.bfloat16),      # pr1 (row 0)
            pltpu.SemaphoreType.DMA((2,)),                  # wsem
            pltpu.SemaphoreType.DMA((2,)),                  # dsem
            pltpu.SemaphoreType.DMA((2,)),                  # kvsem
            pltpu.SemaphoreType.DMA((2,)),                  # scsem
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
        packed["attn_norm"].astype(jnp.float32)[:, None, :],
        packed["mlp_norm"].astype(jnp.float32)[:, None, :],
        scale_f32("q_proj"), scale_f32("k_proj"), scale_f32("v_proj"),
        scale_f32("o_proj"), scale_f32("gate_proj"), scale_f32("up_proj"),
        scale_f32("down_proj"),
        packed["q_proj"]["q8c"], packed["k_proj"]["q8c"],
        packed["v_proj"]["q8c"], packed["o_proj"]["q8c"],
        packed["gate_proj"]["q8c"], packed["up_proj"]["q8c"],
        packed["down_proj"]["q8r"],
        slab["kv"], slab["kvsc"],
    )
    slab = land_new_kv(slab, newkv, s0, step)
    return hidden, slab
