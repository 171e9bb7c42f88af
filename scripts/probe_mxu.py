"""Int8-MXU utilization probe at exact serving-prefill shapes (VERDICT r4 #1).

The shipped chunk-64 prefill runs ~1835 ms against an int8-MXU ideal of
~680 ms; round 4 falsified the quantize-epilogue theory (fused kernel lost
9% e2e), leaving "MXU utilization of the int8 dots at these shapes" as an
unevidenced conjecture. This script measures the dots IN ISOLATION, one
hypothesis per variant, at the real geometry (B=64, T=318, 7B widths,
4-layer scan x 7 matmuls — qkvo + gate/up/down):

  bf16        plain bf16 dots — the 197 TFLOPS reference point
  int8        pure int8xint8->int32 dots, no quantize/rescale epilogues —
              the raw MXU issue rate at these shapes (394 TOPS peak)
  w8a8        the real serving chain (per-row absmax quantize + dot + rescale)
  w8a8_2d     same, x reshaped [B*T, K] around every dot — is XLA lowering
              the 3D dot as a BATCHED matmul (64 separate M=318 ops)?
  w8a8_unroll python-loop layers instead of lax.scan — does scanning over
              stacked weights insert per-layer weight copies?
  w8a8_tNNN   T padded 318 -> NNN (320/384/512): token-axis alignment
              (efficiency = useful FLOPs at T=318 per wall second)

Prints ms/iter, achieved TOPS, and % of the respective peak. Optionally
dumps compiled HLO (--hlo) for the w8a8 variant.

Run on the real chip (ONE process):
  nohup python scripts/probe_mxu.py > /tmp/mxu.log 2>&1 &
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

D, F = 4096, 11008
PEAK_INT8_TOPS = 394.0  # v5e
PEAK_BF16_TFLOPS = 197.0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--tokens", type=int, default=318)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument(
        "--variants", type=str,
        default="bf16,int8,w8a8,w8a8_2d,w8a8_unroll,w8a8_t320,w8a8_t384,w8a8_t512",
    )
    ap.add_argument("--hlo", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    B, T, L = args.batch, args.tokens, args.layers
    # 7 matmuls/layer: q,k,v,o [D,D], gate,up [D,F], down [F,D]
    flops_layer = 2 * (4 * D * D + 3 * D * F)  # per token
    print(f"# devices={jax.devices()}", file=sys.stderr, flush=True)

    def stacked_int8(key_shapes):
        return {
            name: (jnp.zeros((L,) + s, jnp.int8), jnp.zeros((L, s[1]), jnp.float32))
            for name, s in key_shapes.items()
        }

    shapes = {
        "q": (D, D), "k": (D, D), "v": (D, D), "o": (D, D),
        "g": (D, F), "u": (D, F), "d": (F, D),
    }

    def quant_rows(x):
        xf = x.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
        return q, s

    def w8a8_dot(x, wq, ws, two_d):
        shape = x.shape
        if two_d:
            x = x.reshape(-1, shape[-1])
        xq, xs = quant_rows(x)
        acc = jax.lax.dot_general(
            xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (acc.astype(jnp.float32) * xs * ws).astype(jnp.bfloat16)
        if two_d:
            y = y.reshape(shape[:-1] + (wq.shape[1],))
        return y

    def layer_w8a8(x, lw, two_d):
        a = sum(w8a8_dot(x, lw[n][0], lw[n][1], two_d) for n in ("q", "k", "v"))
        x = x + w8a8_dot(a, lw["o"][0], lw["o"][1], two_d)
        g = w8a8_dot(x, lw["g"][0], lw["g"][1], two_d)
        u = w8a8_dot(x, lw["u"][0], lw["u"][1], two_d)
        y = jax.nn.silu(g) * u
        return x + w8a8_dot(y, lw["d"][0], lw["d"][1], two_d)

    def make(variant):
        t = T
        if variant.startswith("w8a8_t"):
            t = int(variant[len("w8a8_t"):])
        if variant == "bf16":
            w = {n: jnp.zeros((L,) + s, jnp.bfloat16) for n, s in shapes.items()}

            def run(x, w):
                def layer(x, lw):
                    a = x @ lw["q"] + x @ lw["k"] + x @ lw["v"]
                    x = x + a @ lw["o"]
                    y = jax.nn.silu(x @ lw["g"]) * (x @ lw["u"])
                    return x + y @ lw["d"], None

                return jax.lax.scan(layer, x, w)[0]

            x = jnp.zeros((B, t, D), jnp.bfloat16)
            return run, x, w
        if variant == "int8":
            w = stacked_int8(shapes)

            def run(x, w):
                def dot(a, wq):
                    acc = jax.lax.dot_general(
                        a, wq, (((a.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    # cheapest int32 -> int8 feedthrough; timing only
                    return (acc & 0x7F).astype(jnp.int8)

                def layer(x, lw):
                    a = dot(x, lw["q"][0])
                    x = dot(a, lw["o"][0])
                    g = dot(x, lw["g"][0])
                    return dot(g, lw["d"][0]), None

                # 4 chained dots/layer; q,k,v,g,u same shapes -> scale FLOPs
                return jax.lax.scan(layer, x, w)[0]

            x = jnp.zeros((B, t, D), jnp.int8)
            flops = 2 * (2 * D * D + 2 * D * F) * B * t * L
            return run, x, w, flops
        if variant == "qapply":
            # the REAL serving entry path (ops.quant.q8_apply[_multi] with
            # stacked {"q8","scale"} dicts, scanned) — MLP-only chain, the
            # exact arrangement llama._mlp_block runs at prefill
            from revisionllm_tpu.ops.quant import q8_apply, q8_apply_multi

            w = {
                n: {"q8": jnp.zeros((L,) + s, jnp.int8),
                    "scale": jnp.zeros((L, s[1]), jnp.float32)}
                for n, s in (("g", (D, F)), ("u", (D, F)), ("d", (F, D)))
            }

            def run(x, w):
                def layer(x, lw):
                    g, u = q8_apply_multi(x, (lw["g"], lw["u"]))
                    return x + q8_apply(jax.nn.silu(g) * u, lw["d"]), None

                return jax.lax.scan(layer, x, w)[0]

            x = jnp.zeros((B, t, D), jnp.bfloat16)
            flops = 2 * 3 * D * F * B * t * L
            return run, x, w, flops
        if variant == "mlponly":
            # my raw-w8a8 version of the same MLP-only chain
            w = stacked_int8({"g": (D, F), "u": (D, F), "d": (F, D)})

            def run(x, w):
                def layer(x, lw):
                    g = w8a8_dot(x, lw["g"][0], lw["g"][1], False)
                    u = w8a8_dot(x, lw["u"][0], lw["u"][1], False)
                    return x + w8a8_dot(
                        jax.nn.silu(g) * u, lw["d"][0], lw["d"][1], False
                    ), None

                return jax.lax.scan(layer, x, w)[0]

            x = jnp.zeros((B, t, D), jnp.bfloat16)
            flops = 2 * 3 * D * F * B * t * L
            return run, x, w, flops
        if variant.startswith("attn_"):
            # attention at serving-prefill shapes [B, T, H=32, hd=128]:
            # the einsum path's f32 score tensor is ~830 MB/layer of HBM
            # traffic; measure f32 vs bf16 scores vs the flash kernel
            H, hd = 32, 128
            mode = variant[len("attn_"):]

            def run(x, w):
                from revisionllm_tpu.ops.flash_attention import (
                    flash_attention, mha_reference,
                )

                q, k, v = x, x, x

                def step(q, _):
                    if mode == "f32":
                        o = mha_reference(q, k, v, causal=True)
                    elif mode == "bf16":
                        s = jnp.einsum(
                            "bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.bfloat16,
                        ) * (1.0 / hd ** 0.5)
                        Tq, S = q.shape[1], k.shape[1]
                        row = jnp.arange(Tq)[:, None]
                        col = jnp.arange(S)[None, :]
                        s = jnp.where((row >= col)[None, None], s,
                                      jnp.bfloat16(-30000.0))
                        p = jax.nn.softmax(s, axis=-1)
                        o = jnp.einsum("bhts,bshd->bthd", p, v)
                    elif mode == "flash":
                        Tq, S = q.shape[1], k.shape[1]
                        o = flash_attention(
                            q, k, v, causal=True,
                            block_q=min(Tq, 512),
                            block_k=min(-(-S // 128) * 128, 512),
                        )
                    else:
                        raise ValueError(mode)
                    return q + 0.001 * o.astype(q.dtype), None

                return jax.lax.scan(step, q, None, length=L)[0]

            x = jnp.zeros((B, t, 32, 128), jnp.bfloat16)
            # 2 einsums x 2 flops, causal halves the useful work
            flops = 2 * 2 * B * 32 * t * t * 128 * L // 2
            return run, x, None, flops
        # w8a8 family
        w = stacked_int8(shapes)
        two_d = variant.endswith("_2d")
        unroll = variant.endswith("_unroll")

        def run(x, w):
            if unroll:
                for i in range(L):
                    lw = {n: (w[n][0][i], w[n][1][i]) for n in shapes}
                    x = layer_w8a8(x, lw, two_d)
                return x

            def layer(x, lw):
                return layer_w8a8(x, lw, two_d), None

            return jax.lax.scan(layer, x, w)[0]

        x = jnp.zeros((B, t, D), jnp.bfloat16)
        return run, x, w

    for variant in args.variants.split(","):
        try:
            made = make(variant)
            if len(made) == 4:
                run, x, w, flops = made
            else:
                run, x, w = made
                t_pad = x.shape[1]
                flops = flops_layer * B * t_pad * L
            fn = jax.jit(run)

            def sync(out):
                # force completion via a TINY fetch: device_get of the full
                # [64,T,4096] output ships ~166 MB over the relay and was
                # measured to DOMINATE the timing (first probe session read
                # 6% of peak for everything — artifact)
                return np.asarray(out[0, 0, 0])

            t0 = time.time()
            out = fn(x, w)
            sync(out)
            compile_s = time.time() - t0
            if args.hlo and variant in ("w8a8", "qapply", "mlponly"):
                try:
                    txt = fn.lower(x, w).compile().as_text()
                    open(f"/tmp/{variant}_hlo.txt", "w").write(txt)
                    print(f"# wrote /tmp/{variant}_hlo.txt ({len(txt)} bytes)",
                          file=sys.stderr, flush=True)
                except Exception as e:  # relay may not expose compiled HLO
                    print(f"# hlo dump failed: {e}", file=sys.stderr)
            sync(fn(x, w))  # warm
            t0 = time.time()
            for _ in range(args.iters):
                out = fn(x, w)
            sync(out)
            dt = (time.time() - t0) / args.iters
            peak = PEAK_BF16_TFLOPS if variant == "bf16" else PEAK_INT8_TOPS
            tops = flops / dt / 1e12
            # useful-work efficiency: padded-T variants only count T=318
            useful = flops * (T / x.shape[1]) / dt / 1e12
            print(
                f"{variant:14s} compile={compile_s:6.1f}s  {dt*1e3:8.2f} ms/iter"
                f"  {tops:6.1f} TOPS ({100*tops/peak:4.1f}% peak)"
                f"  useful={useful:6.1f}",
                flush=True,
            )
        except Exception as e:
            print(f"{variant:14s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
