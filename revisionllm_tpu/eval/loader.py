"""Engine construction from CLI args: checkpoint assembly + tokenizer.

The glue between the eval CLIs and the converted checkpoints — parity with
the reference's load_pretrained_model call sites
(eval_nlq_negative.py:143, eval_nlq_retrieval_e2e2.py:180).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from revisionllm_tpu.config import AdapterConfig, EvalConfig
from revisionllm_tpu.eval.engine import GroundingEngine
from revisionllm_tpu.models.convert import jnp_tree, load_pretrained

from revisionllm_tpu.utils.backend import is_tpu_backend as _is_tpu_backend


def adapter_cfg_from_args(args) -> AdapterConfig:
    hierarchy = bool(getattr(args, "hierarchy", False))
    if getattr(args, "clip_adapter", False) or getattr(args, "pretrain_clip_adapter", None):
        return AdapterConfig(
            kind="clip_encoder",
            d_model=getattr(args, "adapter_d_model", 768),
            num_heads=getattr(args, "adapter_heads", 8),
            num_layers=getattr(args, "adapter_layers", 2),
            ffn_dim=getattr(args, "adapter_ffn", 2048),
            clip_adapter_text=bool(getattr(args, "clip_adapter_text", False)),
            cross_attn=bool(getattr(args, "cross_attn", False)),
            hierarchy=hierarchy,
            feature_mode="cls" if hierarchy else getattr(args, "clip_adapter_feature", "temporal"),
        )
    return AdapterConfig(kind="mlp", hierarchy=hierarchy)


def eval_cfg_from_args(args) -> EvalConfig:
    return EvalConfig(
        debug_window=args.debug_window,
        num_frames=args.num_frames,
        feature_fps=args.feature_fps,
        batch=args.batch,
        stride=getattr(args, "stride", 2),
        split=args.split,
        total_split=args.total_split,
        score=getattr(args, "score", "mean_entropy"),
        score_merge=getattr(args, "score_merge", "multiply"),
        normalize=bool(getattr(args, "normalize", True)),
        topk_pool=bool(getattr(args, "topk_pool", True)),
        skip_small_videos=bool(getattr(args, "skip_small_videos", True)),
        single=bool(getattr(args, "single", True)),
        max_new_tokens=getattr(args, "max_new_tokens", 32),
        baseline=bool(getattr(args, "baseline", False)),
        plus_baseline=bool(getattr(args, "plus_baseline", False)),
        hierarchy_zooms=tuple(
            int(z) for z in str(getattr(args, "zooms", None) or "4,2,1").split(",")
        ),
    )


def build_engine_from_args(args) -> GroundingEngine:
    adapter_cfg = adapter_cfg_from_args(args)

    llama_cfg, params, vision = load_pretrained(
        args.model_base,
        adapter_cfg,
        mm_projector_path=(
            getattr(args, "pretrain_clip_adapter", None)
            or getattr(args, "pretrain_mm_mlp_adapter", None)
        ),
        stage2_lora=getattr(args, "stage2", None),
        stage3_lora=getattr(args, "stage3", None),
        dtype=jnp.bfloat16,
    )
    adapter_cfg = adapter_cfg.with_hidden(llama_cfg.hidden_size)
    # serving quantization BEFORE device transfer: a real 7B checkpoint in
    # bf16 (13.5 GB) does not fit v5e-16GB next to the KV cache; int8 is the
    # validated serving default (BENCH_NOTES 'Quant promotion').
    # REVISIONLLM_QUANT=none keeps dense weights (small models / debugging).
    import os

    import jax

    default_quant = "int8" if _is_tpu_backend() else "none"
    serving_quant = os.environ.get("REVISIONLLM_QUANT", default_quant)
    if serving_quant == "int8":
        from revisionllm_tpu.ops.quant import quantize_llama_params_host

        params = quantize_llama_params_host(params)
        # REVISIONLLM_SERVE=1: pack into the contiguous serving-chunk layout
        # in host RAM (the packed copy replaces — never coexists with — the
        # standard tree in HBM); decode then runs the fused serve kernel
        # when the backbone shape supports it (ops/decode_serve.py)
        if os.environ.get("REVISIONLLM_SERVE", "0") == "1":
            from revisionllm_tpu.ops.decode_serve import supports_serve
            from revisionllm_tpu.ops.quant import pack_serving_weights_host

            if supports_serve(llama_cfg, params):
                params = dict(params)
                params["layers"] = pack_serving_weights_host(params["layers"])
    params = jnp_tree(params)
    # note: llama.fuse_layer_matrices (qkv/gateup fusion) measured NEUTRAL to
    # slightly negative at these shapes (the gate/up split copies large
    # prefill activations); left opt-in rather than default
    vision = jnp_tree(vision) if vision is not None else None

    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(args.model_base, use_fast=True)

    mesh = None
    mesh_arg = getattr(args, "mesh", None)
    if mesh_arg:
        from revisionllm_tpu.parallel.mesh import create_mesh

        dp, fsdp, tp = (int(x) for x in mesh_arg.split(","))
        mesh = create_mesh(dp, fsdp, tp)

    return GroundingEngine(
        llama_cfg, adapter_cfg, params, vision, tokenizer,
        eval_cfg_from_args(args),
        eos_id=tokenizer.eos_token_id or 2,
        mesh=mesh,
    )
