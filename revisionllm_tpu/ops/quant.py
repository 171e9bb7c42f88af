"""Int8 weight quantization + Pallas quantized matmul.

TPU-native counterpart of the reference's native quantization component
(revisionllm/model/chatglm/quantization.py:15-40 — int4/int8 CUDA kernels
shipped via cpm_kernels), generalized to the Vicuna path: per-output-channel
absmax int8 weights halve HBM footprint AND halve the weight-streaming time
of the memory-bound decode step (7B bf16 = 13.5 GB does not fit v5e-16GB next
to a KV cache; int8 = 6.75 GB does).

The Pallas kernel streams int8 blocks HBM->VMEM, converts to bf16 in VMEM
(never materializing a bf16 copy in HBM), runs the MXU dot with fp32
accumulation, and applies the per-channel scale at the final K block.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from revisionllm_tpu.utils.backend import is_tpu_backend as _is_tpu_backend


def quantize_int8(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """w: [..., K, N] -> (int8 values [..., K, N], fp32 scales [..., N]).

    Per-output-channel absmax (the standard W8A16 scheme; reference
    W8A16Linear quantizes per-row of the torch [out, in] layout, which is the
    same channel axis)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / scale[..., None, :]), -127, 127
    ).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_int8(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale[..., None, :]).astype(dtype)


def _q8_matmul_kernel(
    x_ref,      # [bm, bk] activations
    w_ref,      # [bk, bn] int8
    s_ref,      # [1, bn] fp32 scales
    o_ref,      # [bm, bn]
    acc_ref,    # [bm, bn] fp32 scratch
    *,
    num_k_blocks: int,
):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...].astype(x_ref.dtype)  # int8 -> bf16 in VMEM
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == num_k_blocks - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[0, :]).astype(o_ref.dtype)


def _q8_block_n_default() -> int:
    import os

    return int(os.environ.get("REVISIONLLM_Q8_BN", "512"))


def int8_matmul(
    x: jnp.ndarray,
    w_q8: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    block_m: int = 256,
    block_n: Optional[int] = None,
    block_k: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [M, K] (bf16/f32); w_q8: [K, N] int8; scale: [N] fp32 -> [M, N].

    Leading batch dims of x are flattened into M. block_k=4096 measured ~7%
    faster than 2048 on the decode matmul chain (fewer k-steps, bigger DMAs;
    2 MB weight blocks still double-buffer inside the 16 MB VMEM budget)."""
    orig_shape = x.shape
    K = x.shape[-1]
    N = w_q8.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    if block_n is None:
        block_n = _q8_block_n_default()
    bm = min(block_m, max(8, M))
    bn = min(block_n, N)
    bk = min(block_k, K)
    pad_m = (-M) % bm
    pad_k = (-K) % bk
    pad_n = (-N) % bn
    if pad_m or pad_k:
        x2 = jnp.pad(x2, ((0, pad_m), (0, pad_k)))
    wq = w_q8
    sc = scale
    if pad_k or pad_n:
        wq = jnp.pad(wq, ((0, pad_k), (0, pad_n)))
        sc = jnp.pad(sc, ((0, pad_n),))
    Mp, Kp, Np = M + pad_m, K + pad_k, N + pad_n
    nk = Kp // bk

    out = pl.pallas_call(
        functools.partial(_q8_matmul_kernel, num_k_blocks=nk),
        grid=(Mp // bm, Np // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # 16 MB measured BEST for this kernel (a 40 MB limit let the
            # scheduler pick slower buffering: 2234 vs 2119 ms chunk-64
            # latency); REVISIONLLM_Q8_VMEM overrides for experiments with
            # REVISIONLLM_Q8_BN >= 2048 blocks (v5e has ~45 MB usable)
            vmem_limit_bytes=int(
                __import__("os").environ.get("REVISIONLLM_Q8_VMEM", str(16 * 2**20))
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp * 2 + Kp * Np + Mp * Np * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, wq, sc[None, :])

    out = out[:M, :N]
    return out.reshape(*orig_shape[:-1], N)


def _w8a8_impl(x: jnp.ndarray, w_q8: jnp.ndarray, w_scale: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x_scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    x_q8 = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q8, w_q8, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * x_scale * w_scale).astype(x.dtype)


def w8a8_matmul(x: jnp.ndarray, w_q8: jnp.ndarray, w_scale: jnp.ndarray) -> jnp.ndarray:
    """Dynamic-activation int8 matmul: per-row absmax quantize x, int8 x int8
    MXU dot (2x bf16 throughput on v5e), rescale. Default for the
    compute-bound prefill on TPU (REVISIONLLM_W8A8=0 opts out); ~0.3%
    relative error typical. XLA lowers the int8 dot natively.

    Straight-through gradient: round() in the activation quantization has a
    zero derivative, so naive jax.grad through this path would zero the
    activation gradient to every earlier layer. The custom VJP backpropagates
    g @ W_dequant^T as if the matmul were exact, so training over a quantized
    base stays correct even without the trainer's dequant-at-trace guard."""

    @jax.custom_vjp
    def inner(x):
        return _w8a8_impl(x, w_q8, w_scale)

    def fwd(x):
        return inner(x), None

    def bwd(_, g):
        # g has the output dtype == x dtype; keep it for the cotangent
        w = dequantize_int8(w_q8, w_scale, jnp.float32)
        gx = jax.lax.dot_general(
            g.astype(jnp.float32), w, (((g.ndim - 1,), (1,)), ((), ())),
        )
        return (gx.astype(g.dtype),)

    inner.defvjp(fwd, bwd)
    return inner(x)


_W8A8_PREFILL = None


def set_w8a8(enabled: Optional[bool]) -> None:
    """Override the W8A8-prefill switch (None = re-read the environment)."""
    global _W8A8_PREFILL
    _W8A8_PREFILL = enabled


def _w8a8_enabled() -> bool:
    """Dynamic-activation int8 prefill. Default ON for TPU serving (validated:
    see BENCH_NOTES 'Quant promotion' — argmax flips well under the
    temperature-0.05 sampling noise the reference decodes with);
    REVISIONLLM_W8A8=0 opts out. Defaults OFF on cpu/gpu backends so unit
    tests exercise exact dequant parity; set_w8a8(True) or the env var
    engages the same numerics there (validation harness)."""
    global _W8A8_PREFILL
    if _W8A8_PREFILL is None:
        import os

        env = os.environ.get("REVISIONLLM_W8A8")
        if env is not None:
            _W8A8_PREFILL = env == "1"
        else:
            _W8A8_PREFILL = _is_tpu_backend()
    return _W8A8_PREFILL


_EXACT_TRACE = False


def set_exact_trace(enabled: bool) -> None:
    """Force every DEFAULT-dispatch quantized matmul onto the differentiable
    exact-dequant route (no Pallas kernel, no W8A8 activation rounding).

    The trainer's _dequant_trace guard sets this while a loss is traced:
    the Pallas int8/int4 kernels carry no JVP rule, so a small-M call
    (M <= pallas_max_m — e.g. stage-2/stage-3 hierarchy sequences of ~256
    tokens) reached under jax.grad on a TPU backend fails to differentiate.
    Explicit use_pallas=True requests still win (kernel-parity tests)."""
    global _EXACT_TRACE
    _EXACT_TRACE = enabled


def q8_apply(
    x: jnp.ndarray, w, use_pallas: Optional[bool] = None,
    pallas_max_m: int = 256,
) -> jnp.ndarray:
    """Matmul dispatch: w is either a dense array or a {'q8', 'scale'} dict.

    Small-M (decode) calls are HBM-bound — the Pallas kernel streams int8 and
    converts in VMEM. Large-M (prefill/training) calls are MXU-bound — the
    XLA convert+dot path is equally fast there and avoids extra Mosaic kernel
    compiles (remote compile costs ~minutes per kernel shape on axon).
    On non-TPU backends (tests) the int8 path always dequantizes via jnp.

    An EXPLICIT use_pallas=False is an exact-path request: it disables both
    the Pallas kernel and the lossy W8A8 large-M path (ADVICE r2) — callers
    wanting exact dequant numerics get them regardless of backend defaults.
    use_pallas=None (the default) resolves per backend and lets W8A8 engage
    wherever _w8a8_enabled() says so (incl. the CPU validation harness via
    set_w8a8(True))."""
    if isinstance(w, dict) and "q4" in w:
        return q4_apply(x, w, use_pallas=use_pallas)
    if isinstance(w, dict) and ("q8c" in w or "q8r" in w):
        return q8c_apply(x, w, use_pallas=use_pallas, pallas_max_m=pallas_max_m)
    if not (isinstance(w, dict) and "q8" in w):
        return x @ w
    explicit_exact = use_pallas is False
    if use_pallas is None:
        if _EXACT_TRACE:
            use_pallas, explicit_exact = False, True
        else:
            use_pallas = _is_tpu_backend()
    M = 1
    for d in x.shape[:-1]:
        M *= d
    if use_pallas and M <= pallas_max_m:
        return int8_matmul(x, w["q8"], w["scale"])
    if _w8a8_enabled() and not explicit_exact and M > pallas_max_m:
        # large-M int8-activation path; engages off-TPU only when explicitly
        # enabled (backend-conditional default in _w8a8_enabled)
        return w8a8_matmul(x, w["q8"], w["scale"])
    return x @ dequantize_int8(w["q8"], w["scale"], x.dtype)


def q8_apply_multi(
    x: jnp.ndarray, ws, use_pallas: Optional[bool] = None,
    pallas_max_m: int = 256,
):
    """Apply several quantized matrices to the SAME activation, sharing ONE
    activation quantization on the large-M W8A8 path.

    q/k/v read one norm output and gate/up another; routing each through
    q8_apply re-runs the absmax+round+clip quantization per matmul — at
    prefill geometry that is ~3 redundant HBM passes over [B, T, D] per
    layer (XLA does not reliably CSE across the separate custom_vjp calls).
    Numerics are bit-exact vs separate w8a8_matmul calls (identical
    quantization of identical input); the straight-through VJP sums the
    per-output cotangents through the dequantized weights.

    Falls back to per-matrix q8_apply whenever the shared path does not
    apply (non-q8 formats, small M, W8A8 off, explicit exact request)."""
    ws = tuple(ws)
    plain = all(
        isinstance(w, dict) and "q8" in w
        and "q4" not in w and "q8c" not in w and "q8r" not in w
        for w in ws
    )
    M = 1
    for d in x.shape[:-1]:
        M *= d
    shared = (
        plain and len(ws) >= 2 and use_pallas is not False
        and not _EXACT_TRACE and _w8a8_enabled() and M > pallas_max_m
    )
    if not shared:
        return tuple(
            q8_apply(x, w, use_pallas=use_pallas, pallas_max_m=pallas_max_m)
            for w in ws
        )
    w_q8s = tuple(w["q8"] for w in ws)
    w_scales = tuple(w["scale"] for w in ws)

    @jax.custom_vjp
    def inner(x):
        xf = x.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        x_scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        x_q8 = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
        outs = []
        for wq, wsc in zip(w_q8s, w_scales):
            acc = jax.lax.dot_general(
                x_q8, wq, (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            outs.append((acc.astype(jnp.float32) * x_scale * wsc).astype(x.dtype))
        return tuple(outs)

    def fwd(x):
        return inner(x), None

    def bwd(_, gs):
        gx = None
        for g, wq, wsc in zip(gs, w_q8s, w_scales):
            w = dequantize_int8(wq, wsc, jnp.float32)
            part = jax.lax.dot_general(
                g.astype(jnp.float32), w, (((g.ndim - 1,), (1,)), ((), ())),
            )
            gx = part if gx is None else gx + part
        return (gx.astype(gs[0].dtype),)

    inner.defvjp(fwd, bwd)
    return inner(x)


def _w8a8_colchunk_matmul(
    x: jnp.ndarray, q8c: jnp.ndarray, scale_r: jnp.ndarray
) -> jnp.ndarray:
    """w8a8_matmul over the [nc, D, BN] column-chunk layout: one int8
    dot_general with the chunk axis as a result dim, free output reshape to
    [.., nc*BN]. Same straight-through VJP as w8a8_matmul (the activation
    round() must not zero gradients to earlier layers)."""
    nc, D, BN = q8c.shape

    @jax.custom_vjp
    def inner(x):
        xf = x.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        x_scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        x_q8 = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x_q8, q8c, (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [.., nc, BN]
        out = acc.astype(jnp.float32) * x_scale[..., None] * scale_r
        return out.astype(x.dtype).reshape(*x.shape[:-1], nc * BN)

    def fwd(x):
        return inner(x), None

    def bwd(_, g):
        g3 = g.reshape(*g.shape[:-1], nc, BN).astype(jnp.float32)
        wf = q8c.astype(jnp.float32) * scale_r[:, None, :]
        gx = jax.lax.dot_general(
            g3, wf, (((g3.ndim - 2, g3.ndim - 1), (0, 2)), ((), ())),
        )
        return (gx.astype(g.dtype),)

    inner.defvjp(fwd, bwd)
    return inner(x)


def q8c_apply(
    x: jnp.ndarray, w, use_pallas: Optional[bool] = None,
    pallas_max_m: int = 256,
) -> jnp.ndarray:
    """q8_apply over the SERVING-PACKED chunk layout (ops/decode_serve.py):

    - {'q8c': [nc, D, BN], 'scale': [Np]}  column chunks: each chunk routes
      through the standard q8_apply dispatch (Pallas / W8A8 / exact dequant)
      and the outputs concatenate along the last axis. Padded columns carry
      zero scale, so outputs beyond the logical N are exactly 0 (the MLP's
      silu(0)*0 path keeps them inert; q/k/v/o pack with Np == N).
    - {'q8r': [ncf, BF, D], 'scale': [D]}  down_proj row chunks: the
      contraction splits over row blocks and accumulates; x may carry padded
      Fp columns (zero rows contribute nothing).

    This is how prefill and the scan decode path consume the packed layout —
    the pack REPLACES the standard tree in HBM, so there is no [D, N] copy
    to fall back to.

    Large-M routes run as ONE dot_general over the 3D chunk tensor (the
    chunk axis rides as a result dim; the output reshape [.., nc, BN] ->
    [.., Np] is free on the contiguous result) — a per-chunk python loop
    would cost a concatenate copy per matmul and, for the row chunks, ncf
    materialized f32 partials. Only the small-M Pallas decode fallback
    loops per chunk (tiny outputs, the serve kernel is the default there).
    """
    if use_pallas is None and _EXACT_TRACE:
        use_pallas = False
    explicit_exact = use_pallas is False
    resolved_pallas = _is_tpu_backend() if use_pallas is None else use_pallas
    M = 1
    for d in x.shape[:-1]:
        M *= d
    if "q8c" in w:
        q8c, scale = w["q8c"], w["scale"]
        nc, D, BN = q8c.shape
        if resolved_pallas and M <= pallas_max_m:
            outs = [
                int8_matmul(x, q8c[j], scale[j * BN : (j + 1) * BN])
                for j in range(nc)
            ]
            return jnp.concatenate(outs, axis=-1)
        scale_r = scale.reshape(nc, BN)
        if _w8a8_enabled() and not explicit_exact and M > pallas_max_m:
            return _w8a8_colchunk_matmul(x, q8c, scale_r)
        wf = q8c.astype(x.dtype) * scale_r[:, None, :].astype(x.dtype)
        out = jax.lax.dot_general(x, wf, (((x.ndim - 1,), (1,)), ((), ())))
        return out.reshape(*x.shape[:-1], nc * BN)
    q8r, scale = w["q8r"], w["scale"]
    ncf, BF, D = q8r.shape
    # [ncf, BF, D] is the padded [Fp, D] matrix, contiguous: reshape is free
    return q8_apply(
        x, {"q8": q8r.reshape(ncf * BF, D), "scale": scale},
        use_pallas=use_pallas, pallas_max_m=pallas_max_m,
    )


def pack_serving_weights_host(layers: dict, block_n: int = 1024,
                              block_f: int = 1024) -> dict:
    """Numpy variant of decode_serve.pack_serving_weights for the loader:
    pack a quantized layer tree in host RAM so the packed copy never
    coexists with the standard one in HBM."""
    import math

    import numpy as np

    from revisionllm_tpu.ops.decode_serve import COL_MATS

    def rup(x, m):
        return ((x + m - 1) // m) * m

    f_pad = math.lcm(block_n, block_f)
    out = {}
    for name in COL_MATS:
        wq = np.asarray(layers[name]["q8"])
        s = np.asarray(layers[name]["scale"], dtype=np.float32)
        L, D, N = wq.shape
        Np = rup(N, f_pad if name in ("gate_proj", "up_proj") else block_n)
        nc = Np // block_n
        if Np != N:
            wq = np.pad(wq, ((0, 0), (0, 0), (0, Np - N)))
            s = np.pad(s, ((0, 0), (0, Np - N)))
        out[name] = {
            "q8c": np.ascontiguousarray(
                wq.reshape(L, D, nc, block_n).transpose(0, 2, 1, 3)
            ),
            "scale": s,
        }
    wd = np.asarray(layers["down_proj"]["q8"])
    L, F, D = wd.shape
    Fp = rup(F, f_pad)
    if Fp != F:
        wd = np.pad(wd, ((0, 0), (0, Fp - F), (0, 0)))
    out["down_proj"] = {
        "q8r": wd.reshape(L, Fp // block_f, block_f, D),
        "scale": np.asarray(layers["down_proj"]["scale"], dtype=np.float32),
    }
    for name, v in layers.items():
        if name not in out:
            out[name] = v
    return out


def quantize_llama_params_host(params, quantize_lm_head: bool = True):
    """Numpy (host-RAM) variant of quantize_llama_params: quantize a
    CONVERTED checkpoint before any device transfer, so loading a real 7B
    never stages the 13.5 GB bf16 tree in HBM next to its int8 copy."""
    import numpy as np

    def q(w):
        wf = np.asarray(w, dtype=np.float32)
        absmax = np.max(np.abs(wf), axis=-2)
        scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
        vals = np.clip(np.round(wf / scale[..., None, :]), -127, 127).astype(np.int8)
        return {"q8": vals, "scale": scale}

    out = dict(params)
    layers = {}
    for name, w in params["layers"].items():
        if name.endswith("_norm") or name.endswith("_bias") or (
            hasattr(w, "ndim") and w.ndim < 3
        ):
            layers[name] = w
        else:
            layers[name] = q(w)
    out["layers"] = layers
    if quantize_lm_head and not isinstance(params["lm_head"], dict):
        out["lm_head"] = q(params["lm_head"])
    return out


def quantize_llama_params(params, quantize_lm_head: bool = True):
    """Quantize all stacked layer matrices (and optionally lm_head) of a
    models/llama param tree to int8. Norms and embed stay bf16."""
    out = dict(params)
    layers = {}
    for name, w in params["layers"].items():
        if name.endswith("_norm"):
            layers[name] = w
        else:
            q, s = quantize_int8(w)  # [L, K, N] -> [L, K, N] i8 + [L, N]
            layers[name] = {"q8": q, "scale": s}
    out["layers"] = layers
    if quantize_lm_head:
        q, s = quantize_int8(params["lm_head"])
        out["lm_head"] = {"q8": q, "scale": s}
    return out


# ---------------------------------------------------------------------------
# Int4 (W4A16) — group-wise quantization, packed two nibbles per byte
# ---------------------------------------------------------------------------


def quantize_int4(w: jnp.ndarray, group: int = 128) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """w: [K, N] -> (packed uint8 [K//2, N], scales fp32 [K//group, N]).

    Group-wise absmax along K (per output channel): int4 range [-7, 7].
    Rows 2i (low nibble) and 2i+1 (high nibble) pack into byte i. The int4
    counterpart of the reference's cpm int4 kernels
    (model/chatglm/quantization.py:29-40)."""
    K, N = w.shape[-2], w.shape[-1]
    assert K % group == 0 and K % 2 == 0
    wf = w.astype(jnp.float32).reshape(*w.shape[:-2], K // group, group, N)
    absmax = jnp.max(jnp.abs(wf), axis=-2)  # [..., K//group, N]
    scale = jnp.where(absmax > 0, absmax / 7.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -7, 7).astype(jnp.int32)
    q = q.reshape(*w.shape[:-2], K, N)
    lo = q[..., 0::2, :] & 0xF
    hi = q[..., 1::2, :] & 0xF
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return packed, scale.astype(jnp.float32)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """uint8 [K//2, N] -> int32 [K, N] in [-8, 7] (sign-extended nibbles)."""
    lo = (packed & 0xF).astype(jnp.int32)
    hi = ((packed >> 4) & 0xF).astype(jnp.int32)
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    K2 = packed.shape[-2]
    stacked = jnp.stack([lo, hi], axis=-2)  # [..., K//2, 2, N]
    return stacked.reshape(*packed.shape[:-2], K2 * 2, packed.shape[-1])


def dequantize_int4(
    packed: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16, group: int = 128
) -> jnp.ndarray:
    q = unpack_int4(packed)  # [..., K, N]
    K, N = q.shape[-2], q.shape[-1]
    qg = q.reshape(*q.shape[:-2], K // group, group, N).astype(jnp.float32)
    return (qg * scale[..., None, :]).reshape(*q.shape[:-2], K, N).astype(dtype)


def _q4_matmul_kernel(
    x_ref,       # [bm, bk]
    w_ref,       # [bk//2, bn] uint8
    s_ref,       # [gk, bn] fp32 (this block's gk = bk//group scale rows)
    o_ref,       # [bm, bn]
    acc_ref,     # [bm, bn] fp32
    *,
    num_k_blocks: int,
    group: int,
):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    packed = w_ref[...].astype(jnp.int32)  # widen before bitwise (Mosaic-safe)
    lo = packed & 0xF
    hi = (packed >> 4) & 0xF
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    k2, bn = packed.shape
    gk = (k2 * 2) // group
    w = jnp.stack([lo, hi], axis=1).reshape(k2 * 2, bn).astype(jnp.float32)
    w = (w.reshape(gk, group, bn) * s_ref[...][:, None, :]).reshape(k2 * 2, bn)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w.astype(x_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == num_k_blocks - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def int4_matmul(
    x: jnp.ndarray,
    w_packed: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    group: int = 128,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [M, K]; w_packed: [K//2, N] uint8; scale: [K//group, N] -> [M, N].

    int4 streams HBM->VMEM packed (half the int8 traffic), unpacks and
    dequantizes group-wise in VMEM, MXU dot with fp32 accumulation. block_k
    spans multiple groups (Mosaic scale-block rule: bk//group must be
    8-divisible or cover the whole scale array)."""
    orig_shape = x.shape
    K = x.shape[-1]
    N = w_packed.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    assert K % group == 0

    bm = min(block_m, max(8, M))
    bn = min(block_n, N)
    bk = min(block_k, K)
    if bk < K and (bk // group) % 8:
        bk = 8 * group  # smallest legal multi-group block
    pad_m = (-M) % bm
    pad_k = (-K) % bk
    pad_n = (-N) % bn
    if pad_m or pad_k:
        x2 = jnp.pad(x2, ((0, pad_m), (0, pad_k)))
    wq = w_packed
    sc = scale
    if pad_k or pad_n:
        wq = jnp.pad(wq, ((0, pad_k // 2), (0, pad_n)))
        sc = jnp.pad(sc, ((0, pad_k // group), (0, pad_n)))
    Mp, Kp, Np = M + pad_m, K + pad_k, N + pad_n
    nk = Kp // bk
    gk = bk // group

    out = pl.pallas_call(
        functools.partial(_q4_matmul_kernel, num_k_blocks=nk, group=group),
        grid=(Mp // bm, Np // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((gk, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x2, wq, sc)
    return out[:M, :N].reshape(*orig_shape[:-1], N)


def q4_apply(
    x: jnp.ndarray, w, use_pallas: Optional[bool] = None, group: int = 128,
    pallas_max_m: int = 256,
):
    """Matmul for {'q4','scale4'} weight dicts. Small-M (decode) goes through
    the Pallas kernel (int4 weight streaming is the win); large-M (prefill)
    is MXU-bound — XLA dequant+dot avoids the unpack-per-k-block overhead,
    mirroring the int8 dispatch above."""
    if use_pallas is None:
        use_pallas = False if _EXACT_TRACE else _is_tpu_backend()
    M = 1
    for d in x.shape[:-1]:
        M *= d
    if use_pallas and (M <= pallas_max_m or _q4_all_pallas()):
        return int4_matmul(x, w["q4"], w["scale4"], group=group)
    return x @ dequantize_int4(w["q4"], w["scale4"], x.dtype, group)


_Q4_ALL_PALLAS = None


def _q4_all_pallas() -> bool:
    """REVISIONLLM_Q4_PALLAS=all routes every int4 matmul (prefill included)
    through the Pallas kernel instead of XLA dequant+dot — the int4 unpack
    pattern can block XLA's dequant-into-dot fusion at large M."""
    global _Q4_ALL_PALLAS
    if _Q4_ALL_PALLAS is None:
        import os

        _Q4_ALL_PALLAS = os.environ.get("REVISIONLLM_Q4_PALLAS", "") == "all"
    return _Q4_ALL_PALLAS


def quantize_llama_params_int4(params, group: int = 128, quantize_lm_head: bool = True):
    """Int4 variant of quantize_llama_params (weights 3.4 GB at 7B)."""
    out = dict(params)
    layers = {}
    for name, w in params["layers"].items():
        if w.ndim < 3 or name.endswith("_norm") or name.endswith("_bias"):
            layers[name] = w
        else:
            q, s = quantize_int4(w, group)
            layers[name] = {"q4": q, "scale4": s}
    out["layers"] = layers
    if quantize_lm_head and not isinstance(params["lm_head"], dict):
        q, s = quantize_int4(params["lm_head"], group)
        out["lm_head"] = {"q4": q, "scale4": s}
    return out


# ---------------------------------------------------------------------------
# Fused W8A8 MLP tail: gate/up int8 dots + SwiGLU + requantize epilogue
# ---------------------------------------------------------------------------


def _fused_mlp_kernel(xq_ref, xs_ref, gq_ref, gs_ref, uq_ref, us_ref,
                      hq_ref, hs_ref, acc_g, acc_u, *, n_k):
    """One [bm, N] row-block: accumulate int8 gate/up dots over K blocks,
    then silu(g)*u, per-row absmax, int8 quantize — the next activation
    leaves the MXU already quantized (no bf16 h materialization in HBM and
    no separate absmax/round/clip passes)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_g[:] = jnp.zeros_like(acc_g)
        acc_u[:] = jnp.zeros_like(acc_u)

    x = xq_ref[:]
    acc_g[:] += jax.lax.dot_general(
        x, gq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_u[:] += jax.lax.dot_general(
        x, uq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == n_k - 1)
    def _epilogue():
        xs = xs_ref[:]  # [bm, 1] f32
        g = acc_g[:].astype(jnp.float32) * xs * gs_ref[:]
        u = acc_u[:].astype(jnp.float32) * xs * us_ref[:]
        h = (g / (1.0 + jnp.exp(-g))) * u  # silu(g) * u
        absmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
        hs = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        hq_ref[:] = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)
        hs_ref[:] = hs


def w8a8_mlp_fused(
    x_q8: jnp.ndarray,
    x_scale: jnp.ndarray,
    g_q8: jnp.ndarray,
    g_scale: jnp.ndarray,
    u_q8: jnp.ndarray,
    u_scale: jnp.ndarray,
    *,
    block_m: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(x_q8 [M, K] i8, x_scale [M, 1] f32) x gate/up ([K, N] i8 + [N] f32)
    -> (h_q8 [M, N] i8, h_scale [M, 1] f32), h = silu(x@G) * (x@U).

    The quantize-epilogue experiment (VERDICT r3 #5): the whole SwiGLU tail
    runs in VMEM against int32 MXU accumulators held across K blocks, so the
    intermediate [M, N] activation never exists in HBM in bf16 and the next
    (down_proj) matmul consumes int8 directly. The full [bm, N] row block
    stays resident (N=11008 -> 2x11 MB int32 scratch at bm=256); v5e has
    ~45 MB usable VMEM (BENCH_NOTES megakernel series)."""
    M, K = x_q8.shape
    N = g_q8.shape[-1]
    bm = min(block_m, max(8, M))
    bk = min(block_k, K)
    pad_m = (-M) % bm
    pad_k = (-K) % bk
    if pad_m or pad_k:
        x_q8 = jnp.pad(x_q8, ((0, pad_m), (0, pad_k)))
    if pad_m:
        x_scale = jnp.pad(x_scale, ((0, pad_m), (0, 0)), constant_values=1.0)
    if pad_k:
        g_q8 = jnp.pad(g_q8, ((0, pad_k), (0, 0)))
        u_q8 = jnp.pad(u_q8, ((0, pad_k), (0, 0)))
    Mp, Kp = x_q8.shape
    n_k = Kp // bk

    grid = (Mp // bm, n_k)
    hq, hs = pl.pallas_call(
        functools.partial(_fused_mlp_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, k: (i, k)),
            pl.BlockSpec((bm, 1), lambda i, k: (i, 0)),
            pl.BlockSpec((bk, N), lambda i, k: (k, 0)),
            pl.BlockSpec((1, N), lambda i, k: (0, 0)),
            pl.BlockSpec((bk, N), lambda i, k: (k, 0)),
            pl.BlockSpec((1, N), lambda i, k: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, N), lambda i, k: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i, k: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, N), jnp.int8),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bm, N), jnp.int32),
            pltpu.VMEM((bm, N), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=int(
                __import__("os").environ.get(
                    "REVISIONLLM_FUSED_MLP_VMEM", str(100 * 2**20)
                )
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Mp * N * Kp,
            bytes_accessed=Mp * Kp + 2 * Kp * N + Mp * N,
            transcendentals=Mp * N,
        ),
        interpret=interpret,
    )(x_q8, x_scale, g_q8, g_scale[None, :], u_q8, u_scale[None, :])
    return hq[:M], hs[:M]


def quantize_activation_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row absmax int8 quantization of an activation [..., D] ->
    (q8 int8, scale f32 [..., 1]) — the dynamic-activation half of W8A8."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q8 = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q8, scale


def w8a8_prequant_matmul(
    x_q8: jnp.ndarray, x_scale: jnp.ndarray, w_q8: jnp.ndarray,
    w_scale: jnp.ndarray, out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """int8 x int8 dot for an activation that is ALREADY quantized (the
    fused-MLP epilogue's output) — no absmax pass."""
    acc = jax.lax.dot_general(
        x_q8, w_q8, (((x_q8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * x_scale * w_scale).astype(out_dtype)


def w8a8_mlp_reference(x_q8, x_scale, g_q8, g_scale, u_q8, u_scale):
    """jnp transcription of the fused kernel's math (f32 SwiGLU on int32
    accumulators) for parity tests."""
    g = jax.lax.dot_general(
        x_q8, g_q8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * x_scale * g_scale[None, :]
    u = jax.lax.dot_general(
        x_q8, u_q8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * x_scale * u_scale[None, :]
    h = (g / (1.0 + jnp.exp(-g))) * u
    absmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    hs = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    return jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8), hs
