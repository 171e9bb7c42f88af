"""Quantized-serving accuracy validation: W8A16 / +W8A8 prefill / +KV8.

Promotion evidence for flipping the 8.2x serving config on by default
(VERDICT round-1 item 3). The reference ships quantized inference as a
first-class path (revisionllm/model/chatglm/quantization.py:43+ W8A16Linear);
ours must ship it on by default with a written accuracy bound.

Method
------
1. Build a Llama tree at REAL 7B width (4096/11008/32000) with HEAVY-TAILED
   channel structure: a fraction of input channels carry 10-60x outlier
   magnitudes (the LLM.int8 observation; the hard case for per-channel
   absmax quantization), plus matching activation outliers via the embedding.
2. Teacher-forced decode: golden fp32 path picks the tokens; every quant
   config replays the same tokens so per-step logits stay comparable.
3. Per step and config, measure against golden:
   - argmax flip rate
   - top-5 overlap
   - max / mean |delta logit| over the vocab
   - flip MARGIN: |golden logit gap| at flipped steps
   and the yardstick the reference itself tolerates: the probability that
   its own temperature-0.05 multinomial sampling (inference.py:49-51) picks
   a non-argmax token from the GOLDEN logits. A quant config whose flip rate
   is below that sampling noise changes answers less than the reference's
   own decode stochasticity.

CLI (CPU, full width, 4 layers, ~1 min):
    PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/validate_quant.py \
        --layers 4 --batch 2 --prompt_len 64 --steps 8

On-chip (32 layers; golden replaced by the W8A16 default since bf16 7B does
not fit 16 GB — measures the *incremental* W8A8/KV8 effect):
    python scripts/validate_quant.py --layers 32 --golden int8 --steps 12
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List, Optional

import numpy as np


def heavy_tailed_params(cfg, key, dtype, outlier_frac=0.003, outlier_scale=30.0):
    """Llama params with per-channel outliers on every matmul input dim.

    Real LLM weight matrices are near-Gaussian per channel but a small set of
    input channels (and the activations flowing through them) carry large
    magnitudes. Scaling whole INPUT channels stresses both weight
    quantization (per-output-channel absmax sees mixed magnitudes) and W8A8
    activation quantization (per-row absmax dominated by outlier features).
    """
    import jax
    import jax.numpy as jnp

    from revisionllm_tpu.models import llama

    params = llama.init_params(cfg, key, jnp.float32)
    D = cfg.hidden_size
    k1, k2 = jax.random.split(jax.random.fold_in(key, 7))
    n_out = max(int(D * outlier_frac), 4)
    idx = jax.random.choice(k1, D, (n_out,), replace=False)
    chan = jnp.ones((D,)).at[idx].set(outlier_scale)

    layers = dict(params["layers"])
    for name in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        # outlier input channels: weight rows scaled down so the product
        # stays O(1) when activations carry the outliers
        layers[name] = layers[name] * (1.0 / chan)[None, :, None]
    params["layers"] = layers
    # embedding writes the activation outliers into the residual stream
    params["embed"] = params["embed"] * chan[None, :]
    return jax.tree.map(lambda x: x.astype(dtype), params)


def converted_geometry_params(cfg, key, dtype, outlier_frac=0.003,
                              outlier_scale=30.0):
    """Llama params with converted-checkpoint STATISTICS at full depth — the
    32-layer validation geometry (VERDICT r2 #7): random-normal trees miss
    the structures that make quantization error accumulate with depth in
    real converted 7B weights. Reproduced here:

    - per-channel weight scales are LOG-NORMAL (sigma 0.4), shared across
      layers for the residual-stream dims (persistent feature channels),
      on top of the outlier channel set of heavy_tailed_params;
    - RMSNorm gains are log-normal with spread GROWING with depth (real
      Llama norm gains reach 5-20x on some channels in late layers) — this
      amplifies per-layer activation magnitude exactly where W8A8 quantizes
      (post-norm), so per-step error compounds through all 32 layers;
    - down_proj entries are Student-t (df=4): the heavy-tailed matrix family
      of converted checkpoints (worst per-channel absmax case);
    - residual-stream magnitude grows with depth via the norm-gain profile
      (the "massive activations" phenomenon).
    """
    import jax
    import jax.numpy as jnp

    from revisionllm_tpu.models import llama

    params = heavy_tailed_params(cfg, key, jnp.float32, outlier_frac,
                                 outlier_scale)
    D, L = cfg.hidden_size, cfg.num_layers
    ks = jax.random.split(jax.random.fold_in(key, 11), 6)

    # persistent per-channel scale on the residual dims
    chan_ln = jnp.exp(0.4 * jax.random.normal(ks[0], (D,)))
    layers = dict(params["layers"])
    for name in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        layers[name] = layers[name] * chan_ln[None, :, None]

    # depth-growing norm-gain spread: sigma 0.1 (layer 0) -> 0.6 (last)
    depth = jnp.linspace(0.1, 0.6, L)[:, None]
    layers["attn_norm"] = jnp.exp(depth * jax.random.normal(ks[1], (L, D)))
    layers["mlp_norm"] = jnp.exp(depth * jax.random.normal(ks[2], (L, D)))

    # heavy-tailed down_proj (student-t df=4 via z/sqrt(chi2/4) — jax.random.t
    # is gamma-rejection-based and unusably slow on CPU at 90M elements)
    shape = layers["down_proj"].shape
    z = jax.random.normal(ks[3], shape)
    chi2 = sum(
        jax.random.normal(jax.random.fold_in(ks[4], i), shape) ** 2
        for i in range(4)
    )
    t = z / jnp.sqrt(jnp.maximum(chi2, 1e-3) / 4.0)
    layers["down_proj"] = t * (cfg.intermediate_size ** -0.5) * 0.7
    params["layers"] = layers
    return jax.tree.map(lambda x: x.astype(dtype), params)


def run_decode(cfg, params, token_ids, steps, *, kv_quant, forced_tokens=None):
    """Prefill + `steps` decode steps; returns per-step logits [steps, B, V].

    forced_tokens [steps, B] (teacher forcing) or None (greedy)."""
    import jax
    import jax.numpy as jnp

    from revisionllm_tpu.models import llama

    B, T = token_ids.shape
    embeds = llama.embed_tokens(params, token_ids)
    positions = jnp.arange(T, dtype=jnp.int32)[None, :].repeat(B, 0)
    prompt_lens = jnp.full((B,), T, jnp.int32)

    logits, prompt_kv = jax.jit(
        lambda p, e: llama.prefill_kv(
            cfg, p, e, positions, kv_lens=prompt_lens, kv_quant=kv_quant
        )
    )(params, embeds)

    G = steps
    gen_cache = {
        "k": jnp.zeros((cfg.num_layers, B, G, cfg.num_kv_heads, cfg.head_dim), embeds.dtype),
        "v": jnp.zeros((cfg.num_layers, B, G, cfg.num_kv_heads, cfg.head_dim), embeds.dtype),
    }
    step_fn = jax.jit(
        lambda p, pkv, gc, s, te: llama.decode_step_split(
            cfg, p, pkv, prompt_lens, gc, s, te
        )
    )
    out_logits = [np.asarray(logits, np.float32)]
    for s in range(steps - 1):
        if forced_tokens is not None:
            tok = jnp.asarray(forced_tokens[s])
        else:
            tok = jnp.argmax(jnp.asarray(out_logits[-1]), axis=-1)
        te = llama.embed_tokens(params, tok[:, None]).astype(embeds.dtype)
        logits, gen_cache = step_fn(params, prompt_kv, gen_cache, jnp.int32(s), te)
        out_logits.append(np.asarray(logits, np.float32))
    return np.stack(out_logits)  # [steps, B, V]


def compare(golden: np.ndarray, test: np.ndarray) -> Dict[str, float]:
    """Per-config metrics vs golden logits ([steps, B, V] each)."""
    S, B, V = golden.shape
    g_arg = golden.argmax(-1)
    t_arg = test.argmax(-1)
    flips = (g_arg != t_arg)
    top5_g = np.argsort(golden, axis=-1)[..., -5:]
    top5_t = np.argsort(test, axis=-1)[..., -5:]
    overlap = np.array([
        [len(set(top5_g[s, b]) & set(top5_t[s, b])) / 5.0 for b in range(B)]
        for s in range(S)
    ])
    d = np.abs(golden - test)
    # margin of golden's argmax over runner-up at flipped positions
    part = np.partition(golden, -2, axis=-1)
    margin = part[..., -1] - part[..., -2]
    flip_margins = margin[flips]
    # a flip is DECISIVE when the golden margin is wide enough that the
    # reference's own temperature-0.05 sampler keeps the argmax with >99%
    # probability: margin > 0.05 * ln(99) ~= 0.23. Flips below that margin
    # are decisions the reference's decode flips itself >=1% of the time.
    decisive = flips & (margin > 0.05 * np.log(99.0))
    return {
        "argmax_flip_rate": float(flips.mean()),
        "decisive_flip_rate": float(decisive.mean()),
        "top5_overlap": float(overlap.mean()),
        "max_abs_dlogit": float(d.max()),
        "mean_abs_dlogit": float(d.mean()),
        "flip_margin_max": float(flip_margins.max()) if flips.any() else 0.0,
        "n_steps_x_batch": int(S * B),
    }


def sampling_flip_rate(golden: np.ndarray, temperature: float = 0.05) -> float:
    """P(temperature sampling != argmax) under the golden logits — the
    decode noise the reference accepts by design (inference.py:49-51)."""
    x = golden / temperature
    x = x - x.max(axis=-1, keepdims=True)
    p = np.exp(x)
    p /= p.sum(axis=-1, keepdims=True)
    return float((1.0 - p.max(axis=-1)).mean())


def main(argv: Optional[List[str]] = None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--prompt_len", type=int, default=64)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--golden", choices=["bf16", "int8"], default="bf16",
                    help="int8: use W8A16 as baseline (for 32-layer on-chip "
                         "runs where bf16 7B does not fit)")
    ap.add_argument("--outlier_scale", type=float, default=30.0)
    ap.add_argument("--stats", choices=["outlier", "converted"], default="outlier",
                    help="converted: full-depth converted-checkpoint weight "
                         "statistics (log-normal channels, depth-growing norm "
                         "gains, student-t down_proj)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from revisionllm_tpu.config import LlamaConfig
    from revisionllm_tpu.models import generation
    from revisionllm_tpu.ops import quant

    cfg = LlamaConfig(num_layers=args.layers)
    key = jax.random.PRNGKey(args.seed)
    dtype = jnp.dtype(cfg.dtype)

    make_params = (
        converted_geometry_params if args.stats == "converted"
        else heavy_tailed_params
    )
    if args.golden == "int8":
        # At 32 layers the bf16 tree (13.4 GB), its creation intermediates,
        # and the int8 tree cannot coexist in 16 GB HBM: build + quantize on
        # the host CPU platform (requires JAX_PLATFORMS=axon,cpu — the
        # launcher below re-execs with it when absent) and transfer int8
        # only (the round-2 eval-loader pattern).
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            import os as _os
            import sys as _sys

            _os.environ["JAX_PLATFORMS"] = (
                _os.environ.get("JAX_PLATFORMS", "") or "axon"
            ) + ",cpu"
            _os.execv(_sys.executable, [_sys.executable] + _sys.argv)
        with jax.default_device(cpu):
            key_cpu = jax.random.PRNGKey(args.seed)  # host-placed key
            host = make_params(cfg, key_cpu, dtype,
                               outlier_scale=args.outlier_scale)
            params_q8 = quant.quantize_llama_params(host)
        del host
        params_q8 = jax.device_put(params_q8, jax.devices()[0])
        params_bf16 = None
    else:
        params_bf16 = make_params(cfg, key, dtype,
                                  outlier_scale=args.outlier_scale)
        params_q8 = quant.quantize_llama_params(params_bf16)

    rng = np.random.default_rng(args.seed)
    token_ids = jnp.asarray(
        rng.integers(10, cfg.vocab_size, size=(args.batch, args.prompt_len)),
        jnp.int32,
    )

    def run_config(name, params, *, w8a8, kv8):
        quant.set_w8a8(w8a8)
        generation.set_kv8(kv8)
        try:
            return run_decode(cfg, params, token_ids, args.steps,
                              kv_quant=kv8, forced_tokens=forced)
        finally:
            quant.set_w8a8(None)
            generation.set_kv8(None)

    # golden picks the token trajectory; all configs replay it
    forced = None
    quant.set_w8a8(False)
    generation.set_kv8(False)
    golden_params = params_q8 if args.golden == "int8" else params_bf16
    golden = run_decode(cfg, golden_params, token_ids, args.steps,
                        kv_quant=False, forced_tokens=None)
    quant.set_w8a8(None)
    generation.set_kv8(None)
    forced = golden.argmax(-1)  # [steps, B]

    configs = []
    if args.golden == "bf16":
        configs.append(("w8a16", params_q8, dict(w8a8=False, kv8=False)))
    configs += [
        ("w8a16+w8a8", params_q8, dict(w8a8=True, kv8=False)),
        ("w8a16+kv8", params_q8, dict(w8a8=False, kv8=True)),
        ("w8a16+w8a8+kv8", params_q8, dict(w8a8=True, kv8=True)),
    ]

    report = {
        "geometry": {
            "layers": args.layers, "hidden": cfg.hidden_size,
            "ffn": cfg.intermediate_size, "vocab": cfg.vocab_size,
            "batch": args.batch, "prompt_len": args.prompt_len,
            "steps": args.steps, "outlier_scale": args.outlier_scale,
            "stats": args.stats,
        },
        "golden": args.golden,
        "sampling_flip_rate_temp0.05": sampling_flip_rate(golden),
        "configs": {},
    }
    for name, params, flags in configs:
        test = run_config(name, params, **flags)
        report["configs"][name] = compare(golden, test)
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
