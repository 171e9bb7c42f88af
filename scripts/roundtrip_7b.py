"""Converter-chain round-trip at full 7B geometry (RUNBOOK.md).

Validates export -> import without a real checkpoint: build random 7B-shaped
base + LoRA + adapter trees, (a) merge LoRA directly in-framework, (b) export
the LoRA + adapter through `export_reference_artifacts` (the reference's
PEFT/torch on-disk format), re-import via `convert_peft_lora` +
`convert_clip_adapter`, merge, and compare logits of (a) vs (b) after int8
serving quantization. Any transpose/naming/stacking bug in the converter
chain shows up as a logit mismatch.

Run on TPU (default geometry, --layers 32) or CPU (--layers 2, same widths).
"""

from __future__ import annotations

import argparse
import os
import tempfile

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--tokens", type=int, default=16)
    ap.add_argument("--tol", type=float, default=2e-2)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from revisionllm_tpu.config import AdapterConfig, LlamaConfig, LoraConfig
    from revisionllm_tpu.models import llama, lora as lora_mod, revisionllm
    from revisionllm_tpu.models.convert import (
        convert_clip_adapter,
        convert_peft_lora,
        jnp_tree,
    )
    from revisionllm_tpu.ops.quant import quantize_llama_params_host
    from revisionllm_tpu.train.checkpoint import export_reference_artifacts

    cfg = LlamaConfig(num_layers=args.layers)
    acfg = AdapterConfig(clip_adapter_text=True, hierarchy=True,
                         feature_mode="cls", hidden_size=cfg.hidden_size)
    lcfg = LoraConfig(r=64, alpha=128)

    # host-side numpy trees (full 7B never lives twice on device)
    rng = np.random.default_rng(0)
    print(f"building random base at {cfg.num_layers}L x {cfg.hidden_size} ...")
    shapes = jax.eval_shape(lambda k: llama.init_params(cfg, k, jnp.float32),
                            jax.random.PRNGKey(0))
    base = jax.tree.map(
        lambda s: rng.normal(size=s.shape, scale=0.02).astype(np.float32), shapes
    )

    L, D, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    dims = {"q_proj": (D, D), "k_proj": (D, D), "v_proj": (D, D),
            "o_proj": (D, D), "gate_proj": (D, F), "up_proj": (D, F),
            "down_proj": (F, D)}
    lora_tree = {"layers": {
        name: {
            "a": rng.normal(size=(L, din, lcfg.r), scale=0.02).astype(np.float32),
            "b": rng.normal(size=(L, lcfg.r, dout), scale=0.02).astype(np.float32),
        } for name, (din, dout) in dims.items()
    }}
    vision = revisionllm.init_vision_params(acfg, jax.random.PRNGKey(1))
    vision_np = jax.tree.map(np.asarray, vision)

    with tempfile.TemporaryDirectory() as td:
        export_reference_artifacts(td, lora_tree, lcfg, vision=vision_np)
        lora_back, lcfg_back = convert_peft_lora(td, cfg, np.float32)
        import torch

        raw = {k: v.numpy() for k, v in
               torch.load(os.path.join(td, "non_lora_trainables.bin"),
                          map_location="cpu", weights_only=True).items()}
        vision_back = convert_clip_adapter(raw, acfg, np.float32)

    # exact host-side round-trip checks (no tolerance needed pre-merge)
    for name in dims:
        np.testing.assert_allclose(
            lora_back["layers"][name]["a"], lora_tree["layers"][name]["a"],
            rtol=0, atol=0, err_msg=f"lora a {name}")
        np.testing.assert_allclose(
            lora_back["layers"][name]["b"], lora_tree["layers"][name]["b"],
            rtol=0, atol=0, err_msg=f"lora b {name}")
    flat_a, _ = jax.tree_util.tree_flatten(vision_np)
    flat_b, _ = jax.tree_util.tree_flatten(jax.tree.map(np.asarray, vision_back))
    assert len(flat_a) == len(flat_b), "vision tree structure changed"
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(xa, xb, rtol=0, atol=0)
    print("host round-trip exact: lora + vision trees identical")

    # merged-forward check (int8 serving layout), on-device. The merge stays
    # in host numpy (a 27 GB fp32 7B tree must never ride through the chip);
    # semantics identical to lora_mod.merge (W <- W + alpha/r * A @ B).
    def merge_host(base_tree, lt):
        merged = dict(base_tree)
        merged["layers"] = dict(base_tree["layers"])
        scale = lora_mod.lora_scale(lcfg)
        for name, mats in lt["layers"].items():
            w = np.asarray(merged["layers"][name])
            delta = np.einsum(
                "ldr,lro->ldo",
                np.asarray(mats["a"], np.float32),
                np.asarray(mats["b"], np.float32),
                optimize=True,  # BLAS path: the naive loop is ~100x slower
            ) * scale
            merged["layers"][name] = (w.astype(np.float32) + delta).astype(w.dtype)
        return merged

    ids = jnp.asarray(rng.integers(10, cfg.vocab_size,
                                   size=(args.batch, args.tokens)), jnp.int32)
    pos = jnp.arange(args.tokens)[None, :].repeat(args.batch, 0)

    def forward(params_q):
        e = llama.embed_tokens(params_q, ids)
        h = llama.forward_hidden(cfg, params_q, e.astype(jnp.float32), pos)
        return llama.logits_from_hidden(params_q, h[:, -1])

    logits = []
    for lt in (lora_tree, lora_back):
        merged = merge_host(base, lt)
        merged = jax.tree.map(np.asarray, merged)
        q = jnp_tree(quantize_llama_params_host(merged))
        logits.append(np.asarray(jax.jit(forward)(q)))
        del merged, q

    d = np.max(np.abs(logits[0] - logits[1]))
    print(f"merged int8 forward max |dlogit| = {d:.3e} (tol {args.tol})")
    assert d <= args.tol, "round-trip forward mismatch"
    print("roundtrip_7b OK")


if __name__ == "__main__":
    main()
