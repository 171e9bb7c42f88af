"""Decode-step decomposition study (round-2 megakernel groundwork).

Times the 7B int8 serving decode step end-to-end (12-step scan, value-fetch
timing per BENCH_NOTES measurement rules) in ablation variants to locate the
per-step cost that is neither the q8 matmul chain nor the attention einsums:

  full          decode_step_split as shipped (KV8 layout per serving default)
  kv_closure    prompt KV indexed inside the body (dynamic_index_in_dim)
                instead of riding the scan xs — tests the scan-slice-copy
                hypothesis for the missing ~10 ms
  no_attn       attention replaced by identity on q: matmul chain + glue
  no_mlp        mlp removed: attention + qkvo + glue
  attn_only     all 7 projections removed (q/k/v derived from h for free):
                attention + glue
  glue_only     projections AND attention removed: norms/rope/residual/scan

Run on the real chip (ONE process; all variants sequentially):
  python scripts/profile_decode.py --variants full,kv_closure,no_attn
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=318)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--kv8", type=int, default=1)
    ap.add_argument(
        "--variants", type=str,
        default="full,kv_closure,no_attn,no_mlp,attn_only,glue_only",
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from revisionllm_tpu.config import LlamaConfig
    from revisionllm_tpu.models import llama
    from revisionllm_tpu.ops.norms import rms_norm
    from revisionllm_tpu.ops.quant import q8_apply, quantize_llama_params
    from revisionllm_tpu.ops.rope import rope_angles

    cfg = LlamaConfig(num_layers=args.layers)
    dtype = jnp.dtype(cfg.dtype)
    B, S, G = args.batch, args.seq, args.steps
    H, KH, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    D = cfg.hidden_size

    shapes = jax.eval_shape(
        lambda k: quantize_llama_params(llama.init_params(cfg, k, dtype)),
        jax.random.PRNGKey(0),
    )
    serve_only = args.variants == "serve"
    if serve_only:
        # the serve kernel reads layer weights from its packed copy only;
        # skip the 6.6 GB standard layer tree (packed + slab + standard
        # would exceed 16 GB)
        shapes = dict(shapes)
        shapes["layers"] = {
            k: v for k, v in shapes["layers"].items() if k.endswith("_norm")
        }
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    kv8 = bool(args.kv8)
    L = cfg.num_layers
    fused_only = args.variants == "fused"
    if fused_only or serve_only:
        prompt_kv = None  # these variants build their packed layout directly
    elif kv8:
        prompt_kv = {
            "k": jnp.zeros((L, B, S, KH, hd), jnp.int8),
            "k_scale": jnp.ones((L, B, S, KH), jnp.float32),
            "v": jnp.zeros((L, B, S, KH, hd), jnp.int8),
            "v_scale": jnp.ones((L, B, S, KH), jnp.float32),
        }
    else:
        prompt_kv = {
            "k": jnp.zeros((L, B, S, KH, hd), dtype),
            "v": jnp.zeros((L, B, S, KH, hd), dtype),
        }
    prompt_lens = jnp.full((B,), S - 2, jnp.int32)
    gen0 = {
        "k": jnp.zeros((L, B, G, KH, hd), dtype),
        "v": jnp.zeros((L, B, G, KH, hd), dtype),
    }
    tok0 = jnp.zeros((B, 1, D), dtype)

    group = H // KH
    quantized = kv8

    def make_fused():
        """The ops/decode_step.py megakernel in the same 12-step harness."""
        from revisionllm_tpu.ops import decode_step as DS
        from revisionllm_tpu.ops.norms import rms_norm
        from revisionllm_tpu.ops.rope import rope_angles as RA

        if fused_only:
            # zeros in the packed layout directly: the split-form cache +
            # packed copy + 7B weights do not coexist in 16 GB
            Sp = ((S + 127) // 128) * 128
            pkv_packed = {
                "kv": jnp.zeros((L, B, 2, KH, Sp, hd), jnp.int8),
                "kvsc": jnp.ones((L, B, 2, KH, Sp), jnp.float32),
            }
        else:
            pkv_packed = DS.pack_prompt_kv(prompt_kv)
        genkv0 = DS.init_gen_cache(L, B, KH, hd, G, dtype)

        def run(params, pkv_packed, genkv0, tok0):
            def sstep(carry, g):
                genkv, te = carry
                pos = (prompt_lens + g)[:, None]
                cos, sin = RA(pos, hd, cfg.rope_theta)
                import os as _os

                hidden, genkv = DS.decode_step_fused(
                    params, pkv_packed, genkv, prompt_lens, g,
                    te[:, 0, :], cos[:, 0], sin[:, 0], eps=cfg.rms_norm_eps,
                    block_n=int(_os.environ.get("MEGA_BN", "1024")),
                    block_f=int(_os.environ.get("MEGA_BF", "1024")),
                    attn_mode=_os.environ.get("MEGA_ATTN", "batched"),
                )
                h = rms_norm(hidden[:, None, :], params["final_norm"], cfg.rms_norm_eps)
                logits = q8_apply(h[:, 0], params["lm_head"]).astype(jnp.float32)
                nxt = jnp.argmax(logits, -1)
                te = llama.embed_tokens(params, nxt[:, None]).astype(dtype)
                return (genkv, te), logits

            (_, _), ls = jax.lax.scan(
                sstep, (genkv0, tok0), jnp.arange(G, dtype=jnp.int32)
            )
            return ls

        fn = jax.jit(run)
        return lambda p, pk, g0, t0: fn(p, pkv_packed, genkv0, t0)

    def make_serve():
        """The ops/decode_serve.py serving-layout kernel (contiguous weight
        chunks + unified KV slab + nb-row batched attention) in the same
        12-step harness. SERVE_NB/SERVE_BN/SERVE_BF tune it."""
        import os as _os

        from revisionllm_tpu.ops import decode_serve as DSV
        from revisionllm_tpu.ops.rope import rope_angles as RA

        BN = int(_os.environ.get("SERVE_BN", "1024"))
        BF = int(_os.environ.get("SERVE_BF", "1024"))
        nb = int(_os.environ.get("SERVE_NB", "4"))
        import math as _math

        fpad = _math.lcm(BN, BF)
        Fp = ((cfg.intermediate_size + fpad - 1) // fpad) * fpad
        # packed zeros built directly in the chunk layout (a 7B standard
        # tree + packed copy would not coexist in 16 GB)
        packed = {}
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            packed[name] = {
                "q8c": jnp.zeros((L, D // BN, D, BN), jnp.int8),
                "scale": jnp.ones((L, D), jnp.float32),
            }
        for name in ("gate_proj", "up_proj"):
            packed[name] = {
                "q8c": jnp.zeros((L, Fp // BN, D, BN), jnp.int8),
                "scale": jnp.ones((L, Fp), jnp.float32),
            }
        packed["down_proj"] = {
            "q8r": jnp.zeros((L, Fp // BF, BF, D), jnp.int8),
            "scale": jnp.ones((L, D), jnp.float32),
        }
        packed["attn_norm"] = params["layers"]["attn_norm"]
        packed["mlp_norm"] = params["layers"]["mlp_norm"]
        Sp = ((S + G + 127) // 128) * 128
        slab0 = {
            "kv": jnp.zeros((L, B, 2, KH, Sp, hd), jnp.int8),
            "kvsc": jnp.ones((L, B, 2, KH, Sp), jnp.float32),
        }

        def run(params, packed, slab0, tok0):
            def sstep(carry, g):
                slab, te = carry
                pos = (prompt_lens + g)[:, None]
                cos, sin = RA(pos, hd, cfg.rope_theta)
                hidden, slab = DSV.decode_step_serve(
                    packed, slab, prompt_lens, g,
                    te[:, 0, :], cos[:, 0], sin[:, 0],
                    s0=S, eps=cfg.rms_norm_eps, nb=nb,
                    interpret=_os.environ.get("SERVE_INTERPRET", "0") == "1",
                )
                h = rms_norm(hidden[:, None, :], params["final_norm"], cfg.rms_norm_eps)
                logits = q8_apply(h[:, 0], params["lm_head"]).astype(jnp.float32)
                nxt = jnp.argmax(logits, -1)
                te = llama.embed_tokens(params, nxt[:, None]).astype(dtype)
                return (slab, te), logits

            (_, _), ls = jax.lax.scan(
                sstep, (slab0, tok0), jnp.arange(G, dtype=jnp.int32)
            )
            return ls

        # no donation: the timing loop reuses slab0 across calls (the scan
        # carry gives XLA one 3.2 GB copy per call, ~0.3 ms/step amortized;
        # the engine integration donates instead). packed rides as a jit
        # ARGUMENT — closing over 6.6 GB of weights embeds them as HLO
        # constants, which the remote-compile relay cannot swallow
        fn = jax.jit(run)
        return lambda p, pk, g0, t0: fn(p, packed, slab0, t0)

    def make_step(variant):
        """One decode step mirroring llama.decode_step_split with ablations."""

        def step_body(params, prompt_kv, gen_cache, step, token_embeds):
            positions = (prompt_lens + step)[:, None]
            cos, sin = rope_angles(positions, hd, cfg.rope_theta)
            prompt_mask = jnp.arange(S)[None, :] < prompt_lens[:, None]
            gen_mask = jnp.broadcast_to(jnp.arange(G)[None, :] <= step, (B, G))

            def attn(q, pk, pv, ksc, vsc, gk, gv):
                qg = q.reshape(B, 1, KH, group, hd)
                scale = hd ** -0.5
                pk_op = pk if pk.dtype == qg.dtype else pk.astype(qg.dtype)
                s1 = jnp.einsum("bokgd,bskd->bkgs", qg, pk_op,
                                preferred_element_type=jnp.float32) * scale
                if quantized:
                    s1 = s1 * jnp.transpose(ksc, (0, 2, 1))[:, :, None, :]
                s1 = jnp.where(prompt_mask[:, None, None, :], s1, -2.0e30)
                s2 = jnp.einsum("bokgd,bskd->bkgs", qg, gk.astype(qg.dtype),
                                preferred_element_type=jnp.float32) * scale
                s2 = jnp.where(gen_mask[:, None, None, :], s2, -2.0e30)
                m = jnp.maximum(jnp.max(s1, -1, keepdims=True),
                                jnp.max(s2, -1, keepdims=True))
                p1, p2 = jnp.exp(s1 - m), jnp.exp(s2 - m)
                denom = jnp.sum(p1, -1, keepdims=True) + jnp.sum(p2, -1, keepdims=True)
                p1v = p1 * jnp.transpose(vsc, (0, 2, 1))[:, :, None, :] if quantized else p1
                pv_op = pv if pv.dtype == qg.dtype else pv.astype(qg.dtype)
                o = (jnp.einsum("bkgs,bskd->bkgd", p1v.astype(qg.dtype), pv_op,
                                preferred_element_type=jnp.float32)
                     + jnp.einsum("bkgs,bskd->bkgd", p2.astype(qg.dtype),
                                  gv.astype(qg.dtype),
                                  preferred_element_type=jnp.float32)) / denom
                return o.reshape(B, 1, H * hd)

            def layer(x, xs):
                if variant == "kv_closure":
                    lp, gk, gv, li = xs
                    pk = jax.lax.dynamic_index_in_dim(prompt_kv["k"], li, 0, False)
                    pv = jax.lax.dynamic_index_in_dim(prompt_kv["v"], li, 0, False)
                    ksc = jax.lax.dynamic_index_in_dim(prompt_kv["k_scale"], li, 0, False) if quantized else None
                    vsc = jax.lax.dynamic_index_in_dim(prompt_kv["v_scale"], li, 0, False) if quantized else None
                elif quantized:
                    lp, pk, pv, ksc, vsc, gk, gv = xs
                else:
                    (lp, pk, pv, gk, gv), (ksc, vsc) = xs, (None, None)
                h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
                proj = variant not in ("attn_only", "glue_only")
                if proj:
                    q = q8_apply(h, lp["q_proj"]).reshape(B, 1, H, hd)
                    k = q8_apply(h, lp["k_proj"]).reshape(B, 1, KH, hd)
                    v = q8_apply(h, lp["v_proj"]).reshape(B, 1, KH, hd)
                else:  # free q/k/v: reshape of h (same shapes, no matmul)
                    q = h.reshape(B, 1, H, hd)
                    k = h[..., : KH * hd].reshape(B, 1, KH, hd)
                    v = h[..., : KH * hd].reshape(B, 1, KH, hd)
                q = llama._rope(cfg, q, cos, sin)
                k = llama._rope(cfg, k, cos, sin)
                gk = jax.lax.dynamic_update_slice(gk, k.astype(gk.dtype), (0, step, 0, 0))
                gv = jax.lax.dynamic_update_slice(gv, v.astype(gv.dtype), (0, step, 0, 0))
                if variant in ("no_attn", "glue_only"):
                    o = q.reshape(B, 1, H * hd)
                else:
                    o = attn(q, pk, pv, ksc, vsc, gk, gv)
                if proj:
                    o = q8_apply(o.astype(x.dtype), lp["o_proj"])
                x = x + o.astype(x.dtype)
                h2 = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
                if variant not in ("no_mlp", "attn_only", "glue_only"):
                    x = x + llama._mlp_block(lp, None, 0.0, h2)
                else:
                    x = x + h2 * 0.5
                return x, (gk, gv)

            if variant == "kv_closure":
                xs = (params["layers"], gen_cache["k"], gen_cache["v"],
                      jnp.arange(L, dtype=jnp.int32))
            elif quantized:
                xs = (params["layers"], prompt_kv["k"], prompt_kv["v"],
                      prompt_kv["k_scale"], prompt_kv["v_scale"],
                      gen_cache["k"], gen_cache["v"])
            else:
                xs = (params["layers"], prompt_kv["k"], prompt_kv["v"],
                      gen_cache["k"], gen_cache["v"])
            hidden, (ngk, ngv) = jax.lax.scan(layer, token_embeds, xs)
            hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
            logits = q8_apply(hidden[:, 0], params["lm_head"]).astype(jnp.float32)
            return logits, {"k": ngk, "v": ngv}

        def run(params, prompt_kv, gen0, tok0):
            def sstep(carry, g):
                gen_cache, te = carry
                logits, gen_cache = step_body(params, prompt_kv, gen_cache, g, te)
                nxt = jnp.argmax(logits, -1)
                te = llama.embed_tokens(params, nxt[:, None]).astype(dtype)
                return (gen_cache, te), logits[:, 0]

            (_, _), ls = jax.lax.scan(
                sstep, (gen0, tok0), jnp.arange(G, dtype=jnp.int32)
            )
            return ls

        return jax.jit(run)

    results = {}
    for variant in args.variants.split(","):
        if variant == "fused":
            fn = make_fused()
        elif variant == "serve":
            fn = make_serve()
        else:
            fn = make_step(variant)
        t0 = time.time()
        out = np.asarray(fn(params, prompt_kv, gen0, tok0))
        compile_s = time.time() - t0
        np.asarray(fn(params, prompt_kv, gen0, tok0))  # warm
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(params, prompt_kv, gen0, tok0)
        np.asarray(out)
        dt = (time.time() - t0) / args.iters
        per_step = dt / G * 1e3
        results[variant] = per_step
        print(f"{variant:12s} compile={compile_s:6.1f}s total={dt*1e3:7.1f}ms "
              f"per_step={per_step:6.2f}ms", flush=True)

    print("\nsummary (ms/step):", {k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
