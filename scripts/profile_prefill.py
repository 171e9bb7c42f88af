"""Prefill decomposition study (round-3: prefill is 75% of chunk latency).

BENCH_NOTES round-2: chunk-64 latency 2119 ms = prefill 1581 ms + decode
~540 ms. The W8A8 int8-MXU roofline for 64x~311 tokens through 7B int8
weights is ~720 ms matmul + ~300 ms bf16 causal attention, so prefill runs
~1.5-2x off roofline. This script locates the gap with separately compiled
end-to-end ablations of the serving prefill (value-fetch timing per
BENCH_NOTES measurement rules):

  full        prefill_kv as served: W8A8 large-M matmuls + Pallas flash +
              inline KV8 quantization
  adapter     encode_video + assemble_inputs only (vision/splice share)
  w8a16       W8A8 off -> bf16 dequant+dot matmuls (int8-MXU benefit)
  no_attn     attention replaced by identity on q
  attn_only   projections replaced by reshapes (attention + glue)
  no_mlp      mlp removed
  glue_only   projections AND attention AND mlp removed
  no_kvq      kv_quant off (inline KV8 quantize share)
  mha_xla     attention via the XLA einsum reference path (is Pallas flash
              actually winning at S~320, B=64, 18k grid cells/layer?)
  flash_bqXXX_bkYYY  flash block-size sweep (e.g. flash_bq384_bk128)

Run on the real chip (ONE process, variants sequential):
  nohup python scripts/profile_prefill.py --variants full,no_attn,... &
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=250)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument(
        "--variants", type=str,
        default="full,adapter,no_attn,no_mlp,attn_only,glue_only,mha_xla",
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from revisionllm_tpu.config import AdapterConfig, LlamaConfig
    from revisionllm_tpu.constants import IMAGE_TOKEN_INDEX
    from revisionllm_tpu.models import llama, revisionllm
    from revisionllm_tpu.models.multimodal import build_splice_plan, stack_plans
    from revisionllm_tpu.ops.flash_attention import flash_attention, mha_reference
    from revisionllm_tpu.ops.norms import rms_norm
    from revisionllm_tpu.ops.quant import q8_apply, quantize_llama_params, set_w8a8
    from revisionllm_tpu.ops.rope import rope_angles

    cfg = LlamaConfig(num_layers=args.layers)
    adapter_cfg = AdapterConfig(
        clip_adapter_text=True, hierarchy=False, feature_mode="temporal",
        hidden_size=cfg.hidden_size,
    )
    dtype = jnp.dtype(cfg.dtype)
    B = args.batch
    num_frames = args.frames
    prompt_extra = 60
    H, KH, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    D = cfg.hidden_size

    shapes = jax.eval_shape(
        lambda k: quantize_llama_params(llama.init_params(cfg, k, dtype)),
        jax.random.PRNGKey(0),
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    vision = revisionllm.init_vision_params(
        adapter_cfg, jax.random.PRNGKey(1), dtype=dtype
    )

    prompt_ids = (
        [1] + list(range(100, 100 + prompt_extra - 20))
        + [IMAGE_TOKEN_INDEX] + list(range(200, 220))
    )
    max_len = num_frames + prompt_extra + 8
    plan_np = stack_plans([build_splice_plan(prompt_ids, num_frames, max_len)] * B)
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()}
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(B, num_frames, 768)).astype(np.float32), dtype)
    query_feats = jnp.asarray(rng.normal(size=(B, 25, 768)).astype(np.float32), dtype)

    def inputs_fn(params, vision, plan, images, query_feats):
        video_tokens = revisionllm.encode_video(adapter_cfg, vision, images, query_feats)
        return revisionllm.assemble_inputs(params, plan, video_tokens, dtype=dtype)

    T = int(
        jax.eval_shape(inputs_fn, params, vision, plan, images, query_feats)[0].shape[1]
    )
    print(f"# B={B} T={T} layers={args.layers}", flush=True)

    def _quantize_kv(t):
        tf = t.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(tf), axis=-1)
        sc = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        q = jnp.clip(jnp.round(tf / sc[..., None]), -127, 127).astype(jnp.int8)
        return q, sc

    def make_variant(variant):
        """A compiled end-to-end program: adapter -> splice -> ablated prefill
        -> last logits + int8 kv (the serving prefill contract)."""
        flash_blocks = None
        if variant.startswith("flash_bq"):
            bq, bk = variant[len("flash_bq"):].split("_bk")
            flash_blocks = (int(bq), int(bk))

        interp = jax.default_backend() == "cpu"  # CPU sanity runs only
        proj_on = variant not in ("attn_only", "glue_only")
        attn_on = variant not in ("no_attn", "glue_only")
        mlp_on = variant not in ("no_mlp", "attn_only", "glue_only")
        kvq_on = variant != "no_kvq"

        def run(params, vision, plan, images, query_feats):
            embeds, positions, lengths = inputs_fn(
                params, vision, plan, images, query_feats
            )
            if variant == "adapter":
                return embeds.sum(), None
            cos, sin = rope_angles(
                positions, int(hd * cfg.rope_fraction), cfg.rope_theta
            )
            kv_lens = lengths

            def layer(x, lp):
                h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
                if proj_on:
                    q = q8_apply(h, lp["q_proj"]).reshape(B, T, H, hd)
                    k = q8_apply(h, lp["k_proj"]).reshape(B, T, KH, hd)
                    v = q8_apply(h, lp["v_proj"]).reshape(B, T, KH, hd)
                else:
                    q = h.reshape(B, T, H, hd)
                    k = h[..., : KH * hd].reshape(B, T, KH, hd)
                    v = h[..., : KH * hd].reshape(B, T, KH, hd)
                q = llama._rope(cfg, q, cos, sin)
                k = llama._rope(cfg, k, cos, sin)
                if not attn_on:
                    o = q.reshape(B, T, H * hd)
                elif variant == "mha_xla":
                    o = mha_reference(q, k, v, causal=True, kv_lens=kv_lens)
                    o = o.reshape(B, T, H * hd)
                elif flash_blocks is not None:
                    o = flash_attention(
                        q, k, v, causal=True, kv_lens=kv_lens,
                        block_q=flash_blocks[0], block_k=flash_blocks[1],
                        interpret=interp,
                    ).reshape(B, T, H * hd)
                else:
                    o = flash_attention(
                        q, k, v, causal=True, kv_lens=kv_lens, interpret=interp
                    )
                    o = o.reshape(B, T, H * hd)
                if proj_on:
                    o = q8_apply(o.astype(x.dtype), lp["o_proj"])
                    x = x + o
                else:
                    x = x + o.astype(x.dtype) * 0.125
                h2 = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
                if mlp_on:
                    x = x + llama._mlp_block(lp, None, 0.0, h2)
                else:
                    x = x + h2 * 0.5
                if kvq_on:
                    kq, ks = _quantize_kv(k.reshape(B, T, KH, hd))
                    vq, vs = _quantize_kv(v.reshape(B, T, KH, hd))
                    return x, (kq, ks, vq, vs)
                return x, (k, v)

            hidden, kv = jax.lax.scan(layer, embeds, params["layers"])
            hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
            idx = jnp.maximum(kv_lens - 1, 0)
            last = jnp.take_along_axis(
                hidden, idx[:, None, None].astype(jnp.int32), axis=1
            )[:, 0]
            logits = q8_apply(last, params["lm_head"]).astype(jnp.float32)
            return logits.sum(), jax.tree.map(lambda t: t[-1, 0, 0], kv)

        return jax.jit(run)

    results = {}
    for variant in args.variants.split(","):
        try:
            if variant == "w8a16":
                set_w8a8(False)
                fn = make_variant("full")
            else:
                set_w8a8(None)
                fn = make_variant(variant)
            t0 = time.time()
            out = fn(params, vision, plan, images, query_feats)
            np.asarray(out[0])
            compile_s = time.time() - t0
            np.asarray(fn(params, vision, plan, images, query_feats)[0])  # warm
            t0 = time.time()
            for _ in range(args.iters):
                out = fn(params, vision, plan, images, query_feats)
            np.asarray(out[0])
            dt = (time.time() - t0) / args.iters * 1e3
            results[variant] = dt
            print(f"{variant:18s} compile={compile_s:6.1f}s total={dt:8.1f}ms",
                  flush=True)
        except Exception as e:  # e.g. bf16-KV OOM at chunk 64 (no_kvq)
            print(f"{variant:18s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    set_w8a8(None)

    print("\nsummary (ms):", {k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
