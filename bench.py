"""Benchmark: grounded queries/sec/chip, stage-1 dense MAD configuration.

Workload (BASELINE.md / reference scripts/mad/eval_stage1_dense.sh): one
query over a 1-hour movie at 5 fps -> 57 overlapping 125 s windows, each
linspace-sampled to 250 frames; every window runs the full grounding forward
(ClipEncoder temporal adapter -> 250 video tokens spliced into the v1 prompt
-> Vicuna-7B prefill -> 12-token greedy decode with inline entropy capture).

Windows are batched per LLM call (the reference uses batch=1 per A100;
batching is the TPU win) in chunks sized to fit HBM next to the int8
weights + int8 prompt KV. Chunk 64 is the measured optimum of the round-2
sweep (32: 0.476, 48: 0.512, 64: 0.525, 80: 0.522, 96: OOM); one 57-window
movie fits a single chunk.

`vs_baseline`: the reference repo publishes no throughput (BASELINE.md), so
the denominator is an estimate of the reference's single-A100 rate on the
same workload: ~0.28 s/window (prefill ~300 tok + ~10 sampled tokens at
batch 1, fp16) -> 57 windows => ~0.0625 queries/sec. Update when a measured
reference number exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: the Pallas kernel compile over the axon relay
# costs ~3 min cold; warm runs load from disk in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

REF_QPS_ESTIMATE = 0.0625  # single-A100 stage-1 dense estimate (see docstring)

_T_START = time.time()


def _phase(msg: str) -> None:
    """Timestamped progress to stderr: a hung/timeout run leaves a diagnosis
    of WHICH phase stalled (round-2 driver bench timed out with an empty log)."""
    print(f"# [{time.time() - _T_START:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    _phase("importing jax + revisionllm_tpu")
    import jax
    import jax.numpy as jnp

    from revisionllm_tpu.config import AdapterConfig, LlamaConfig
    from revisionllm_tpu.constants import IMAGE_TOKEN_INDEX
    from revisionllm_tpu.models import revisionllm
    from revisionllm_tpu.models.multimodal import build_splice_plan, stack_plans
    from __graft_entry__ import _zeros_params

    n_layers = int(os.environ.get("BENCH_LAYERS", "32"))
    chunk = int(os.environ.get("BENCH_CHUNK", "64"))
    use_int8 = os.environ.get("BENCH_INT8", "1") == "1"
    # BENCH_QUANT=int4 swaps the weight format to group-wise int4 (W4A16):
    # 3.4 GB weights at 7B, freeing HBM for larger chunks / longer KV.
    quant_kind = os.environ.get("BENCH_QUANT", "int8" if use_int8 else "none")
    windows_per_query = 57           # 1 h x 5 fps, 125 s windows, 50% overlap
    num_frames = 250
    # "From XXX to YYY." ≈ 9-12 tokens; BENCH_NEW_TOKENS=1 isolates prefill
    # cost (decode share = default run minus that run).
    max_new_tokens = int(os.environ.get("BENCH_NEW_TOKENS", "12"))
    prompt_extra = 60                # v1 system+question tokens around <video>

    _phase(f"imports done; devices={jax.devices()!r}")
    cfg = LlamaConfig(num_layers=n_layers)
    adapter_cfg = AdapterConfig(
        clip_adapter_text=True, hierarchy=False, feature_mode="temporal",
        hidden_size=cfg.hidden_size,
    )
    dtype = jnp.dtype(cfg.dtype)

    if quant_kind in ("int8", "int4"):
        # serving config for 16 GB v5e: int8 weights halve HBM footprint and
        # the weight-streaming time of the memory-bound decode (int4 quarters
        # it). Built directly as quantized zeros — eagerly quantizing a live
        # bf16 7B tree would hold both copies (~20 GB) on device.
        from revisionllm_tpu.models import llama as llama_mod
        from revisionllm_tpu.ops.quant import (
            quantize_llama_params,
            quantize_llama_params_int4,
        )

        quant_fn = (
            quantize_llama_params_int4 if quant_kind == "int4"
            else quantize_llama_params
        )
        # BENCH_SERVE=1: pack layer weights into the contiguous serving-chunk
        # layout (ops/decode_serve.py) — prefill consumes it through
        # q8_apply's chunked dispatch, decode through the fused serve kernel
        if os.environ.get("BENCH_SERVE", "0") == "1" and quant_kind == "int8":
            from revisionllm_tpu.ops.decode_serve import pack_serving_weights

            base_quant_fn = quant_fn

            def quant_fn(p):  # noqa: F811
                q = dict(base_quant_fn(p))
                q["layers"] = pack_serving_weights(q["layers"])
                return q

        shapes = jax.eval_shape(
            lambda k: quant_fn(llama_mod.init_params(cfg, k, dtype)),
            jax.random.PRNGKey(0),
        )
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    else:
        params = _zeros_params(cfg, dtype)
    _phase(f"params built ({quant_kind}, {n_layers} layers)")
    vision = revisionllm.init_vision_params(
        adapter_cfg, jax.random.PRNGKey(1), dtype=dtype
    )

    prompt_ids = (
        [1] + list(range(100, 100 + prompt_extra - 20))
        + [IMAGE_TOKEN_INDEX] + list(range(200, 220))
    )
    max_len = num_frames + prompt_extra + 8
    plan_np = stack_plans(
        [build_splice_plan(prompt_ids, num_frames, max_len)] * chunk
    )
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()}

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(chunk, num_frames, 768)).astype(np.float32), dtype
    )
    query_feats = jnp.asarray(
        rng.normal(size=(chunk, 25, 768)).astype(np.float32), dtype
    )

    # shared-prefix prefill measured -3% at chunk 32 (see BENCH_NOTES); opt-in
    shared_prefix = (
        prompt_ids.index(IMAGE_TOKEN_INDEX)
        if os.environ.get("REVISIONLLM_SHARED_PREFIX", "0") == "1"
        else 0
    )

    # plan rides as an argument, NOT a closure: captured device arrays are
    # baked into the executable as constants, which makes the AOT-serialized
    # blob reload in minutes instead of seconds (jax serialize_executable
    # handles argument-passed buffers, not embedded constants)
    def run(params, vision, plan, images, query_feats):
        out = revisionllm.generate_grounding(
            cfg, adapter_cfg, params, vision, plan, images, query_feats,
            eos_id=2, max_new_tokens=max_new_tokens,
            shared_prefix_len=shared_prefix,
        )
        return out["tokens"], out["entropy_stats"]

    # AOT executable cache (BENCH_AOT=0 to disable): the first driver run
    # pays the compile, later runs reload the executable in ~1 s. Keyed on
    # lowered HLO + device kind, with a safe fall-through to compiling.
    if os.environ.get("BENCH_AOT", "1") == "1":
        from revisionllm_tpu.utils.aot_cache import load_or_compile

        _phase("AOT cache: lowering + load-or-compile")
        t0 = time.time()
        fn = load_or_compile(
            run, params, vision, plan, images, query_feats,
            cache_dir=os.path.join(os.path.dirname(__file__), ".aot_cache"),
        )
    else:
        fn = jax.jit(run)
        t0 = time.time()
    _phase("executable ready; first call (device warm-up)")
    toks, stats = fn(params, vision, plan, images, query_feats)
    np.asarray(toks)
    compile_s = time.time() - t0
    _phase(f"first call done ({compile_s:.1f}s); timing {os.environ.get('BENCH_ITERS', '8')} iters")

    # warm + measure
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    np.asarray(fn(params, vision, plan, images, query_feats)[0])
    t0 = time.time()
    for _ in range(iters):
        toks, stats = fn(params, vision, plan, images, query_feats)
    # value-fetch, not block_until_ready: the relay acks readiness of
    # AOT-loaded executables before the device work drains (false-fast);
    # fetching the last output forces real completion of the serial queue
    np.asarray(toks)
    dt = (time.time() - t0) / iters

    windows_per_sec = chunk / dt
    qps = windows_per_sec / windows_per_query
    # p50 single-query latency: a 1-h movie is ceil(57/chunk) sequential
    # chunks (north-star metric in BASELINE.json; one chunk at chunk>=57)
    chunks_per_query = -(-windows_per_query // chunk)
    p50_s = chunks_per_query * dt
    result = {
        "metric": "grounded_queries_per_sec_per_chip_stage1_dense_1h",
        "value": round(qps, 4),
        "unit": "queries/sec/chip",
        "vs_baseline": round(qps / REF_QPS_ESTIMATE, 2),
    }
    print(
        f"# chunk={chunk} layers={n_layers} compile={compile_s:.1f}s "
        f"chunk_latency={dt*1e3:.1f}ms windows/s={windows_per_sec:.2f} "
        f"p50_query_latency={p50_s:.2f}s",
        file=sys.stderr,
    )
    print(json.dumps(result))
    # second metric line. A default run prints up to THREE JSON lines
    # (headline q/s, p50 latency, fused-pipeline q/s) — the driver keys off
    # metric names and has recorded all three since BENCH_r04.json; set
    # BENCH_EMIT_P50=0 / BENCH_EMIT_E2E=0 for a strict single-line run.
    # p50 single-query latency is a BASELINE.json north-star; the reference
    # at batch 1 takes ~16 s for the same 57-window movie (0.28 s/window).
    if os.environ.get("BENCH_EMIT_P50", "1") == "1":
        print(json.dumps({
            "metric": "p50_query_latency_stage1_dense_1h",
            "value": round(p50_s, 3),
            "unit": "seconds",
            "vs_baseline": round((0.28 * windows_per_query) / p50_s, 2),
        }))
    # third line: the fused recursive pipeline. Time-guarded so a fully cold
    # relay session (headline program server-compile ~7 min) can never push
    # the driver bench past its budget — the headline metric is already out.
    if os.environ.get("BENCH_EMIT_E2E", "1") == "1":
        deadline = float(os.environ.get("BENCH_E2E_DEADLINE_S", "540"))
        if time.time() - _T_START > deadline:
            _phase(
                f"skipping e2e section: {time.time() - _T_START:.0f}s elapsed "
                f"> deadline {deadline:.0f}s (cold relay session); rerun "
                "warm or raise BENCH_E2E_DEADLINE_S"
            )
        else:
            bench_e2e(params)
    # fourth line: multi-query batched throughput (the reference's
    # throughput mode is a 16-way SLURM job array, eval_nlq_negative.py:
    # 179-180; here Q queries share chunks + one row-stacked stage-2).
    if os.environ.get("BENCH_EMIT_MQ", "1") == "1":
        deadline = float(os.environ.get("BENCH_E2E_DEADLINE_S", "540"))
        if time.time() - _T_START > deadline:
            _phase("skipping multi-query section: past deadline (cold session)")
        else:
            bench_e2e(params, mq=int(os.environ.get("BENCH_MQ_Q", "4")))


def bench_e2e(params=None, mq: int = 0):
    """The FUSED recursive pipeline, timed as ONE run per query: stage-1
    dense grounding over every window of a 1-hour movie -> stage-2
    hierarchical retrieval restricted by the grounding prefilter
    (eval_nlq_retrieval_e2e2.py:278-294) -> window-hit mapping -> fusion
    (metric_retrieval_forward.py:107-186). Driven through the REAL
    GroundingEngine (the same host+device path eval/stage1.py and stage2.py
    run), not through isolated device calls; weights are zeros (timing is
    weight-value independent) in the int8 serving layout.

    Emits end_to_end_queries_per_sec_per_chip + p50 as one JSON line.
    vs_baseline: reference runs the same recursive procedure at batch 1 per
    A100: ~16 s stage-1 (57 windows x 0.28 s) + ~2.4 s stage-2 (6 passes,
    ~0.4 s each) per query => ~0.0544 q/s.

    mq > 0: the multi-query BATCHED mode — mq queries run through
    ground_windows_batch (rows packed across queries into shared chunks) +
    retrieve_batch (all queries' zoom passes row-stacked into as few
    bucket-shaped programs as fit, amortizing the weight-bandwidth-bound
    decode across queries). Emits
    end_to_end_queries_per_sec_per_chip_recursive_1h_batched.

    Harness caveats (both modes): weights are ZEROS in the int8 serving
    layout (timing is weight-value independent; accuracy is meaningless
    here), the tokenizer is a FakeTokenizer, and an untrained model answers
    every window, which forces stage-2's dense 10-row bucket — a trained
    model stays on the cheaper 7-row program, so the number is conservative.
    """
    import jax
    import jax.numpy as jnp

    from revisionllm_tpu.config import AdapterConfig, EvalConfig, LlamaConfig
    from revisionllm_tpu.eval import metrics as M
    from revisionllm_tpu.eval.engine import GroundingEngine
    from revisionllm_tpu.eval.stage2 import grounding_prefilter
    from revisionllm_tpu.models import revisionllm
    from revisionllm_tpu.ops.windows import num_windows_strided
    from revisionllm_tpu.utils.testing import FakeTokenizer

    # engine programs persist as AOT executables (minutes to compile over
    # the relay, ~1 s to reload)
    os.environ.setdefault(
        "REVISIONLLM_AOT_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".aot_cache"),
    )

    n_layers = int(os.environ.get("BENCH_LAYERS", "32"))
    chunk = int(os.environ.get("BENCH_CHUNK", "64"))
    cfg = LlamaConfig(num_layers=n_layers)
    dtype = jnp.dtype(cfg.dtype)
    if params is None:
        from revisionllm_tpu.models import llama as llama_mod
        from revisionllm_tpu.ops.quant import quantize_llama_params

        shapes = jax.eval_shape(
            lambda k: quantize_llama_params(llama_mod.init_params(cfg, k, dtype)),
            jax.random.PRNGKey(0),
        )
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    acfg1 = AdapterConfig(
        clip_adapter_text=True, hierarchy=False, feature_mode="temporal",
        hidden_size=cfg.hidden_size,
    )
    acfg2 = AdapterConfig(
        clip_adapter_text=True, hierarchy=True, feature_mode="cls",
        hidden_size=cfg.hidden_size,
    )
    vision1 = revisionllm.init_vision_params(acfg1, jax.random.PRNGKey(1), dtype=dtype)
    vision2 = revisionllm.init_vision_params(acfg2, jax.random.PRNGKey(2), dtype=dtype)
    ecfg1 = EvalConfig(
        debug_window=125, num_frames=250, feature_fps=5.0, batch=chunk,
        stride=2, max_new_tokens=int(os.environ.get("BENCH_NEW_TOKENS", "12")),
    )
    s2_batch = int(os.environ.get("BENCH_S2_BATCH", "100"))
    ecfg2 = EvalConfig(
        debug_window=125, num_frames=250, feature_fps=5.0, batch=s2_batch,
        stride=5, max_new_tokens=8, hierarchy_zooms=(4, 2, 1),
    )
    tok = FakeTokenizer()
    # both engines share ONE base param tree on device (a second 7B int8
    # tree would not fit next to the first + activations)
    eng1 = GroundingEngine(cfg, acfg1, params, vision1, tok, ecfg1)
    eng2 = GroundingEngine(cfg, acfg2, params, vision2, tok, ecfg2)

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(18000, 768)).astype(np.float32)  # 1 h x 5 fps
    qf = rng.normal(size=(25, 768)).astype(np.float32)
    qc = rng.normal(size=(768,)).astype(np.float32)
    qc /= np.linalg.norm(qc)
    gt_sec, duration = (1000.0, 1100.0), 3600.0

    profile = os.environ.get("BENCH_E2E_PROFILE", "0") == "1"

    if mq:
        # extend the stage-2 row buckets so mq queries' passes (10 each in
        # the dense-prefilter case) pack into FEW dispatches per batch.
        # Cap at 20 rows: the 40-row program OOMs the 16 GB chip by ~1 GB
        # (row-linear gather + ClipEncoder activations + KV next to the
        # 6.75 GB int8 weights); Q=4 then runs as two 20-row dispatches —
        # still 2x decode-weight-read amortization per query.
        os.environ.setdefault(
            "REVISIONLLM_S2_ROW_BUCKETS_MQ", "7,10,14,20"
        )
        buckets_mq = os.environ["REVISIONLLM_S2_ROW_BUCKETS_MQ"]

        def one_batch(b: int) -> int:
            old = os.environ.get("REVISIONLLM_S2_ROW_BUCKETS")
            queries = [
                {"sentence": f"a red car {b}_{i}", "query_feats": qf,
                 "query_cls": qc}
                for i in range(mq)
            ]
            glist = eng1.ground_windows_batch(
                feats, queries, movie_key="bench_movie"
            )
            clip_length = int(ecfg2.debug_window * ecfg2.feature_fps)
            nw = num_windows_strided(len(feats), clip_length, ecfg2.stride)
            rqueries = []
            glogs = []
            for i, g in enumerate(glist):
                glog = {
                    "video_id": "bench_movie", "task": "grounding",
                    "query_id": f"q{b}_{i}", "answer": g["answers"],
                    "info": {"iou": [0.0] * len(g["scores"]),
                             "scores": g["scores"]},
                }
                glogs.append(glog)
                gw = grounding_prefilter(glog, nw, ecfg2.stride, s2_batch)
                rqueries.append({
                    **queries[i], "grounding_windows": gw,
                    "rng": np.random.default_rng(b * mq + i),
                })
            os.environ["REVISIONLLM_S2_ROW_BUCKETS"] = buckets_mq
            try:
                rlist = eng2.retrieve_batch(
                    feats, rqueries, movie_key="bench_movie"
                )
            finally:
                if old is None:
                    os.environ.pop("REVISIONLLM_S2_ROW_BUCKETS", None)
                else:
                    os.environ["REVISIONLLM_S2_ROW_BUCKETS"] = old
            from revisionllm_tpu.ops.windows import get_ground_truth_windows

            ts, _ = get_ground_truth_windows(gt_sec[0], gt_sec[1], duration)
            for i, r in enumerate(rlist):
                frames, ious = M.stage2_window_hit(
                    r["answers"], ts, r["starts"], r["indexes"],
                    r["hierarchy_zooms"], r["grounding_windows"], s2_batch,
                )
                rlog = {
                    "video_id": "bench_movie", "task": "grounding",
                    "query_id": f"q{b}_{i}", "answer": r["answers"],
                    "info": {
                        "gt": ts, "frames": frames, "iou": ious,
                        "score_cos": r["score_cos"],
                        "mean_entropy": r["mean_entropy"],
                        "max_entropy": r["max_entropy"],
                        "hierarchy_zooms": r["hierarchy_zooms"],
                    },
                }
                M.fuse_retrieval_grounding([glogs[i]], [rlog])
            return mq

        _phase(f"mq: warm-up batch (Q={mq}; compiles batched programs if cold)")
        one_batch(0)
        iters = int(os.environ.get("BENCH_MQ_ITERS", "4"))
        _phase(f"mq: timing {iters} batches of {mq}")
        lat = []
        for b in range(1, iters + 1):
            t0 = time.time()
            nq = one_batch(b)
            lat.append((time.time() - t0) / nq)
        lat = np.sort(np.asarray(lat))
        p50 = float(lat[len(lat) // 2])
        qps = float(len(lat) / lat.sum())
        ref = 0.0544
        print(
            f"# mq Q={mq} p50={p50:.2f}s/query qps={qps:.4f}",
            file=sys.stderr,
        )
        print(json.dumps({
            "metric": "end_to_end_queries_per_sec_per_chip_recursive_1h_batched",
            "value": round(qps, 4),
            "unit": "queries/sec/chip",
            "vs_baseline": round(qps / ref, 2),
            "p50_s_per_query": round(p50, 3),
            "batch_queries": mq,
        }))
        return

    def one_query(q: int):
        t0 = time.time()

        def mark(name):
            nonlocal t0
            if profile:
                print(f"#   {name}: {(time.time() - t0) * 1e3:.0f} ms",
                      file=sys.stderr, flush=True)
                t0 = time.time()

        sentence = f"a red car {q}"
        g = eng1.ground_windows(feats, sentence, qf, qc, movie_key="bench_movie")
        mark("stage1_ground")
        glog = {
            "video_id": "bench_movie", "task": "grounding",
            "query_id": f"q{q}", "answer": g["answers"],
            "info": {"iou": [0.0] * len(g["scores"]), "scores": g["scores"]},
        }
        clip_length = int(ecfg2.debug_window * ecfg2.feature_fps)
        nw = num_windows_strided(len(feats), clip_length, ecfg2.stride)
        gw = grounding_prefilter(glog, nw, ecfg2.stride, s2_batch)
        mark("prefilter")
        r = eng2.retrieve(feats, sentence, qf, qc, grounding_windows=gw,
                          rng=np.random.default_rng(q), movie_key="bench_movie")
        mark("stage2_retrieve")
        from revisionllm_tpu.ops.windows import get_ground_truth_windows

        ts, _ = get_ground_truth_windows(gt_sec[0], gt_sec[1], duration)
        frames, ious = M.stage2_window_hit(
            r["answers"], ts, r["starts"], r["indexes"],
            r["hierarchy_zooms"], r["grounding_windows"], s2_batch,
        )
        rlog = {
            "video_id": "bench_movie", "task": "grounding",
            "query_id": f"q{q}", "answer": r["answers"],
            "info": {
                "gt": ts, "frames": frames, "iou": ious,
                "score_cos": r["score_cos"], "mean_entropy": r["mean_entropy"],
                "max_entropy": r["max_entropy"],
                "hierarchy_zooms": r["hierarchy_zooms"],
            },
        }
        fused, ratio = M.fuse_retrieval_grounding([glog], [rlog])
        mark("hit_and_fusion")
        return ratio

    _phase("e2e: warm-up query (compiles both engines' programs if cold)")
    one_query(0)
    iters = int(os.environ.get("BENCH_E2E_ITERS", "5"))
    _phase(f"e2e: timing {iters} queries")
    lat = []
    for q in range(1, iters + 1):
        t0 = time.time()
        one_query(q)
        lat.append(time.time() - t0)
    lat = np.sort(np.asarray(lat))
    p50 = float(lat[len(lat) // 2])
    qps = float(len(lat) / lat.sum())
    ref = 0.0544  # batch-1 A100 recursive-pipeline estimate (docstring)
    print(
        f"# e2e p50={p50:.2f}s mean={lat.mean():.2f}s qps={qps:.4f}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "end_to_end_queries_per_sec_per_chip_recursive_1h",
        "value": round(qps, 4),
        "unit": "queries/sec/chip",
        "vs_baseline": round(qps / ref, 2),
        "p50_s": round(p50, 3),
    }))


if __name__ == "__main__":
    main()
