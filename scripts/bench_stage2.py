"""Stage-2 hierarchical retrieval throughput (the OTHER headline workload).

bench.py measures stage-1 dense grounding; this measures the coarse
retrieval pass of reference eval_nlq_retrieval_e2e2.py at the MAD geometry:
one 1-hour movie -> ~57 strided windows, zoom passes [4,2,1] over batches of
100 window-CLS tokens (7 LLM calls in the reference; ONE batched program
row-stack here, engine.retrieve), 32-token decode budget.

  python scripts/bench_stage2.py          # real chip
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    import jax
    import jax.numpy as jnp

    from revisionllm_tpu.config import AdapterConfig, LlamaConfig
    from revisionllm_tpu.constants import IMAGE_TOKEN_INDEX
    from revisionllm_tpu.models import revisionllm
    from revisionllm_tpu.models.multimodal import build_splice_plan, stack_plans
    from revisionllm_tpu.ops.quant import quantize_llama_params

    n_layers = int(os.environ.get("BENCH_LAYERS", "32"))
    batch = int(os.environ.get("BENCH_S2_BATCH", "100"))   # windows per call
    zooms = (4, 2, 1)
    num_frames = 250
    max_new = int(os.environ.get("BENCH_S2_NEW_TOKENS", "8"))
    # rows: one per (zoom, call) pass over ~57 windows (ceil(57/25)=3 +
    # ceil(57/50)=2 + 1 = 6 for a 1-h movie)
    import math

    V = int(os.environ.get("BENCH_S2_WINDOWS", "57"))
    rows = sum(math.ceil(V / max(batch // z, 1)) for z in zooms)

    cfg = LlamaConfig(num_layers=n_layers)
    acfg = AdapterConfig(
        clip_adapter_text=True, hierarchy=True, feature_mode="cls",
        hidden_size=cfg.hidden_size,
    )
    dtype = jnp.dtype(cfg.dtype)

    import jax as _jax

    shapes = _jax.eval_shape(
        lambda k: quantize_llama_params(
            __import__(
                "revisionllm_tpu.models.llama", fromlist=["llama"]
            ).init_params(cfg, k, dtype)
        ),
        _jax.random.PRNGKey(0),
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    vision = revisionllm.init_vision_params(acfg, jax.random.PRNGKey(1), dtype=dtype)

    prompt_ids = (
        [1] + list(range(100, 140)) + [IMAGE_TOKEN_INDEX] + list(range(140, 160))
    )
    plan = build_splice_plan(
        prompt_ids, batch, len(prompt_ids) - 1 + batch + max_new + 8
    )
    plan_j = {k: jnp.asarray(v) for k, v in stack_plans([plan] * rows).items()}

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(rows, batch, num_frames, 768)).astype(np.float32), dtype
    )
    query_feats = jnp.asarray(
        rng.normal(size=(rows, 25, 768)).astype(np.float32), dtype
    )
    qv = jnp.ones((rows, 25), dtype=bool)

    def run(params, vision, plan, images, qf, qv):
        out = revisionllm.generate_grounding(
            cfg, acfg, params, vision, plan, images, qf, qv,
            eos_id=2, max_new_tokens=max_new,
        )
        return out["tokens"], out["entropy_stats"]

    fn = jax.jit(run)
    t0 = time.time()
    toks, _ = fn(params, vision, plan_j, images, query_feats, qv)
    np.asarray(toks)
    compile_s = time.time() - t0

    iters = int(os.environ.get("BENCH_ITERS", "6"))
    np.asarray(fn(params, vision, plan_j, images, query_feats, qv)[0])
    t0 = time.time()
    for _ in range(iters):
        toks, _ = fn(params, vision, plan_j, images, query_feats, qv)
    np.asarray(toks)
    dt = (time.time() - t0) / iters

    print(
        f"# stage-2 retrieval: rows={rows} batch={batch} layers={n_layers} "
        f"compile={compile_s:.1f}s latency={dt*1e3:.1f}ms",
        file=sys.stderr,
    )
    import json

    print(json.dumps({
        "metric": "retrieval_queries_per_sec_per_chip_stage2_100_1h",
        "value": round(1.0 / dt, 4),
        "unit": "queries/sec/chip",
    }))


if __name__ == "__main__":
    main()
