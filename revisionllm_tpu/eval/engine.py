"""Batched hierarchical grounding engine.

The compiled-program replacement for the reference's per-query Python eval
loops (revisionllm/eval/eval_nlq_negative.py:183-341 and
eval_nlq_retrieval_e2e2.py:230-422): window slicing happens once on host as an
integer gather plan, the full window batch is assembled on device, and every
chunk of windows runs ONE jitted program (adapter -> splice -> prefill ->
decode scan with inline entropy). Programs are cached per shape bucket so a
whole eval run compiles a handful of programs.

Stage-1 (`ground_windows`): every window answers "From X to Y" / "Not
Present"; proposals are scored by inverse decode entropy and CLIP cosine.
Stage-2 (`retrieve`): windows are compressed to 1 CLS token each (hierarchy
adapter), shuffled (order-bias mitigation, reference :348-350), zoom-repeated,
and the LLM answers "In video N" per multi-scale pass [4, 2, 1].
"""

from __future__ import annotations

import dataclasses
import functools
import os
import sys
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from revisionllm_tpu.config import AdapterConfig, EvalConfig, LlamaConfig
from revisionllm_tpu.constants import QUESTIONS
from revisionllm_tpu.conversation import CONV_VICUNA_V1
from revisionllm_tpu.eval import metrics as M
from revisionllm_tpu.eval.similarity import proposal_cosine_scores
from revisionllm_tpu.models import revisionllm
from revisionllm_tpu.models.multimodal import build_splice_plan, stack_plans
from revisionllm_tpu.ops import windows as W
from revisionllm_tpu.tokenization import tokenizer_image_token


def _prof(label: str, t0: float) -> float:
    """REVISIONLLM_ENGINE_PROFILE=1: stderr phase timings inside the
    per-query engine path (host planning vs dispatch vs realize vs scoring)
    — the diagnostic that located the stage-2 multi-pass decode residual."""
    if os.environ.get("REVISIONLLM_ENGINE_PROFILE", "0") == "1":
        print(
            f"#     engine.{label}: {(time.time() - t0) * 1e3:.0f} ms",
            file=sys.stderr, flush=True,
        )
    return time.time()


def _map_retrieval_answers(
    answers: Sequence[str],
    inv_entropy: Sequence[float],
    starts: Sequence[int],
    batch: int,
    num_candidates: int,
) -> Tuple[List[int], List[float]]:
    """Map per-pass 'In video N' answers to corpus candidate ids + scores.

    The tail pass overlaps earlier passes (start = V - batch) and pads rows
    by repeating the last candidate when V < batch, so (a) an answer pointing
    at a padded slot maps to the candidate it duplicates, and (b) duplicate
    candidates across passes keep only their best score — otherwise repeats
    push the GT's rank later and distort R@K/MedR."""
    best: Dict[int, float] = {}
    for p, a in enumerate(answers):
        n = M.parse_single(a)
        if n is None:
            continue
        n_rows = min(batch, num_candidates - starts[p])  # real rows this pass
        cand = starts[p] + min(max(n, 0), n_rows - 1)
        s = inv_entropy[p]
        if s > best.get(cand, float("-inf")):
            best[cand] = s
    chosen = list(best.keys())
    return chosen, [best[c] for c in chosen]


@dataclasses.dataclass
class ChunkResult:
    answers: List[str]
    entropy_stats: np.ndarray  # [B, 4] (max, min, mean, std)


class GroundingEngine:
    """Holds model params + jitted per-shape programs."""

    def __init__(
        self,
        llama_cfg: LlamaConfig,
        adapter_cfg: AdapterConfig,
        params: Dict[str, Any],
        vision_params: Dict[str, Any],
        tokenizer,
        eval_cfg: EvalConfig,
        eos_id: int = 2,
        use_pallas: Optional[bool] = None,
        mesh=None,
    ):
        """`mesh` (jax.sharding.Mesh over (data, fsdp, tensor)) turns every
        compiled program into one GSPMD program across the chips: weights
        placed per parallel/sharding.py, the window batch split over the
        (data, fsdp) axes — the multi-chip serving story of SURVEY §2.6
        (replacing the reference's 16 independent SLURM jobs)."""
        self.llama_cfg = llama_cfg
        self.adapter_cfg = adapter_cfg
        self.mesh = mesh
        if mesh is not None:
            from revisionllm_tpu.parallel import serve as serve_lib

            params = serve_lib.shard_params_for_inference(mesh, params)
            if vision_params is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(mesh, P())
                vision_params = jax.tree.map(
                    lambda x: jax.device_put(x, rep), vision_params
                )
        self.params = params
        self.vision_params = vision_params
        self.tokenizer = tokenizer
        self.eval_cfg = eval_cfg
        self.eos_id = eos_id
        self.use_pallas = use_pallas
        self._compiled: Dict[Tuple, Any] = {}
        self._feats_cache: Optional[Tuple[Tuple, Any]] = None

    # --------------------------------------------------------- device gather

    @staticmethod
    def _device_gather_enabled() -> bool:
        """Default ON: ship the MOVIE once (f32, ~55 MB for 1 h at 5 fps) and
        gather windows ON DEVICE — the host-gather path ships every window's
        frames per chunk (~13x more bytes for overlapping stage-1 windows,
        ~2.7x for stage-2 zoom rows), which dominates per-query latency on
        bandwidth-constrained interconnects."""
        import os

        return os.environ.get("REVISIONLLM_DEVICE_GATHER", "1") == "1"

    _CTX_BUCKET = 4096  # frames; pads movie length so one compiled program
    #                     serves every movie within the bucket

    def _features_to_device(self, features: np.ndarray, movie_key=None):
        """[ctx, d] numpy -> padded [ctxp, d] f32 device array, cached by
        movie_key so consecutive same-movie queries skip the transfer.

        The cache is keyed ONLY by (movie_key, shape): callers must make
        movie_key unique per feature CONTENT (e.g. include the source path,
        as eval/msrvtt.py does) — reusing a key for different features of the
        same shape silently serves the stale buffer."""
        ctx, d = features.shape
        ctxp = -(-ctx // self._CTX_BUCKET) * self._CTX_BUCKET
        key = (movie_key, ctx, d)
        if movie_key is not None and self._feats_cache is not None \
                and self._feats_cache[0] == key:
            return self._feats_cache[1]
        buf = np.zeros((ctxp, d), np.float32)
        buf[:ctx] = features
        dev = jnp.asarray(buf)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dev = jax.device_put(dev, NamedSharding(self.mesh, P()))
        if movie_key is not None:
            self._feats_cache = (key, dev)
        return dev

    # ------------------------------------------------------------------ utils

    def _prompt_ids(self, sentence: str, question_template: str) -> List[int]:
        """Build the v1 prompt with <video> sentinel, tokenized
        (parity: inference.py:31-35)."""
        query = "<video>\n" + question_template.format(sentence)
        prompt = CONV_VICUNA_V1.user_turn_prompt(query)
        return tokenizer_image_token(prompt, self.tokenizer)

    def _decode_answers(self, tokens: np.ndarray, valid: np.ndarray) -> List[str]:
        """Token ids -> stripped answer strings (parity: inference.py:62-75)."""
        out = []
        stop = CONV_VICUNA_V1.stop_str
        for row, v in zip(tokens, valid):
            ids = [int(t) for t, ok in zip(row, v) if ok and int(t) != self.eos_id]
            text = self.tokenizer.decode(ids, skip_special_tokens=True).strip()
            if text.endswith(stop):
                text = text[: -len(stop)].strip()
            out.append(text)
        return out

    def _get_program(self, key: Tuple, shared_prefix_len: int = 0,
                     gather: bool = False) -> Any:
        if key not in self._compiled:
            cfg, acfg = self.llama_cfg, self.adapter_cfg
            mesh = self.mesh

            def body(params, vision, plan, images, query_feats, query_valid):
                plan = dict(plan)
                qsel = plan.pop("qsel", None)
                if qsel is not None:
                    # multi-query chunk: rows mix queries, so query features
                    # ride as ONE [Q, Qtok, d] device stack (uploaded once
                    # per batch) gathered per row by the tiny qsel index —
                    # the per-row host stack would re-ship ~2.5 MB per chunk
                    query_feats = query_feats[qsel]
                    query_valid = query_valid[qsel]
                if mesh is not None:
                    from revisionllm_tpu.parallel.mesh import BATCH_AXES
                    from revisionllm_tpu.parallel.serve import batch_sharding

                    n_batch = 1
                    for ax in BATCH_AXES:
                        n_batch *= mesh.shape[ax]
                    if images.shape[0] % n_batch == 0:
                        images = jax.lax.with_sharding_constraint(
                            images, batch_sharding(mesh)
                        )
                    # non-divisible batches (stage-2 zoom rows) still run:
                    # weights stay sharded, the batch replicates
                return revisionllm.generate_grounding(
                    cfg, acfg, params, vision, plan, images, query_feats,
                    query_valid, eos_id=self.eos_id,
                    max_new_tokens=self.eval_cfg.max_new_tokens,
                    temperature=0.0 if self.eval_cfg.greedy else self.eval_cfg.temperature,
                    use_pallas=self.use_pallas,
                    shared_prefix_len=shared_prefix_len,
                )

            if gather:
                # window frames are GATHERED ON DEVICE from the resident
                # movie: the per-chunk transfer is the tiny int32 index
                # tensor instead of [B, T, 768] frame features
                def run(params, vision, plan, feats, idx, query_feats,
                        query_valid):
                    images = feats[idx].astype(jnp.dtype(cfg.dtype))
                    return body(params, vision, plan, images, query_feats,
                                query_valid)
            else:
                run = body

            from revisionllm_tpu.utils.aot_cache import (
                LazyCachedProgram,
                cache_dir_from_env,
            )

            cache_dir = cache_dir_from_env()
            if cache_dir is not None:
                # REVISIONLLM_AOT_CACHE=<dir>: persist the compiled
                # executable across processes (stage-1 programs cost minutes
                # to compile over the axon relay; reload is instant)
                self._compiled[key] = LazyCachedProgram(run, cache_dir)
            else:
                self._compiled[key] = jax.jit(run)
        return self._compiled[key]

    @staticmethod
    def _shared_prefix_len(plan_np: Dict[str, np.ndarray]) -> int:
        """Identical-plan rows share every token before the first video slot
        (text tokens are prompt-wide constants, video features differ).

        Opt-in (REVISIONLLM_SHARED_PREFIX=1): measured neutral-to-negative at
        chunk 32 — the two-piece attention's lane-replicated LSE writes
        (~200 MB/layer/piece) outweigh the ~13% prefix FLOP saving. A fused
        prefix+causal kernel (no LSE round-trip) is the round-2 fix."""
        import os

        if os.environ.get("REVISIONLLM_SHARED_PREFIX", "0") != "1":
            return 0
        from revisionllm_tpu.models.multimodal import KIND_VIDEO

        kind = plan_np["kind"]
        if kind.shape[0] < 2 or not (kind == kind[0]).all() or not (
            plan_np["text_ids"] == plan_np["text_ids"][0]
        ).all():
            return 0
        vid_pos = np.where(kind[0] == KIND_VIDEO)[0]
        return int(vid_pos[0]) if len(vid_pos) else 0

    def _run_chunk(
        self,
        plan_np: Dict[str, np.ndarray],
        images: np.ndarray,
        query_feats: Optional[np.ndarray],
        query_valid: Optional[np.ndarray],
        feats_dev=None,
    ) -> ChunkResult:
        """`images`: [B..., T, d] frame features (host path), or — when
        `feats_dev` (device-resident movie) is given — an int32 [B..., T]
        index tensor gathered on device."""
        dtype = jnp.dtype(self.llama_cfg.dtype)
        spl = self._shared_prefix_len(plan_np)
        plan = jax.device_put(plan_np)  # one transfer dispatch for the tree
        if query_feats is not None:
            qf = jnp.asarray(query_feats, dtype)
            qv = jnp.asarray(query_valid) if query_valid is not None else None
        else:
            qf, qv = None, None
        if feats_dev is not None:
            idx_j = jnp.asarray(np.asarray(images, np.int32))
            key = (
                "gather", feats_dev.shape, idx_j.shape,
                plan["text_ids"].shape, None if qf is None else qf.shape, spl,
                "qsel" in plan_np,
            )
            out = self._get_program(key, shared_prefix_len=spl, gather=True)(
                self.params, self.vision_params, plan, feats_dev, idx_j, qf, qv
            )
            return out
        images_j = jnp.asarray(images, dtype)
        key = (
            images_j.shape, plan["text_ids"].shape,
            None if qf is None else qf.shape, spl, "qsel" in plan_np,
        )
        out = self._get_program(key, shared_prefix_len=spl)(
            self.params, self.vision_params, plan, images_j, qf, qv
        )
        return out  # device arrays; realized by _read_chunk

    def _read_chunk(self, out) -> ChunkResult:
        # one device_get for the whole output tree: each np.asarray is a
        # separate D2H round trip, and on a relay-attached TPU the per-call
        # RPC latency (not the bytes) dominates these small reads
        tp = time.time()
        if os.environ.get("REVISIONLLM_ENGINE_PROFILE", "0") == "1":
            np.asarray(out["entropy_stats"])  # forces program completion
            tp = _prof("rc_program_wait", tp)
        host = jax.device_get(
            {k: out[k] for k in ("tokens", "valid", "entropy_stats")}
        )
        tp = _prof("rc_fetch", tp)
        res = ChunkResult(
            self._decode_answers(host["tokens"], host["valid"]),
            host["entropy_stats"],
        )
        _prof("rc_decode", tp)
        return res

    def _run_chunk_sync(self, plan_np, images, qf, qv) -> ChunkResult:
        return self._read_chunk(self._run_chunk(plan_np, images, qf, qv))

    def _broadcast_query_feats(self, query_feats: np.ndarray, n: int):
        """Ship the [Q, d] query features ONCE and broadcast to [n, Q, d] ON
        DEVICE. The host np.repeat + n-times-larger H2D transfer were a
        measurable per-query cost (relay RPC + this box's throttled host
        memcpy); the compiled program sees the same shape/dtype either way."""
        dtype = jnp.dtype(self.llama_cfg.dtype)
        qf = jnp.broadcast_to(
            jnp.asarray(query_feats, dtype), (n,) + np.shape(query_feats)
        )
        qv = jnp.ones(qf.shape[:2], dtype=bool)
        return qf, qv

    # ---------------------------------------------------------------- stage 1

    def _stage1_plan_idx(self, ctx_len: int) -> np.ndarray:
        """Window planning for dense grounding: [n, num_frames] global frame
        indices per window (baseline / plus_baseline variants included).
        Returns an empty array when the movie is shorter than one window."""
        ecfg = self.eval_cfg
        clip_length = int(ecfg.debug_window * ecfg.feature_fps)
        if ecfg.baseline:
            # single window of the globally-resampled track (reference
            # eval_nlq_negative.py:220-228: resample to clip_length frames,
            # evaluate windowidx=[1]). Index maps compose, so the resample
            # stays an index transform in the device-gather path.
            global_idx = np.linspace(0, ctx_len - 1, clip_length, dtype=np.int32)
            bounds = W.dense_window_bounds(clip_length, clip_length)
            bounds = bounds[1:2] if len(bounds) > 1 else bounds[:1]
            plan_idx = global_idx[
                np.asarray(W.window_frame_indices(bounds, ecfg.num_frames))
            ]
        else:
            bounds = W.dense_window_bounds(ctx_len, clip_length)
            if not bounds:
                return np.zeros((0, ecfg.num_frames), np.int32)
            plan_idx = np.asarray(
                W.window_frame_indices(bounds, ecfg.num_frames), np.int32
            )
        if len(plan_idx) and ecfg.plus_baseline:
            # append one whole-movie window (reference :237-240); its answers
            # map through stage1_iou(plus_baseline=True) with offset 0
            whole_idx = np.linspace(0, ctx_len - 1, ecfg.num_frames, dtype=np.int32)
            plan_idx = np.concatenate([plan_idx, whole_idx[None]], axis=0)
        return plan_idx

    def ground_windows(
        self,
        features: np.ndarray,
        sentence: str,
        query_feats: Optional[np.ndarray] = None,
        query_cls: Optional[np.ndarray] = None,
        question_key: str = "mad_grounding",
        movie_key=None,
    ) -> Dict[str, Any]:
        """Dense grounding over every window of a feature track.

        features: [ctx_l, 768] (full movie). Returns answers + per-window
        entropy scores + proposal cosine scores, the per-query payload of
        reference eval_nlq_negative.py:270-337. `movie_key` (e.g. the movie
        id) lets consecutive same-movie queries reuse the device-resident
        feature buffer.
        """
        ecfg = self.eval_cfg
        tp = time.time()
        plan_idx = self._stage1_plan_idx(len(features))
        if not len(plan_idx):
            return {"answers": [], "scores_entropy": [], "score_cos": [], "frames": {}}

        use_dg = self._device_gather_enabled()
        feats_dev = self._features_to_device(features, movie_key) if use_dg else None
        windows = None if use_dg else features[plan_idx]

        ids = self._prompt_ids(sentence, QUESTIONS[question_key])
        chunk = max(ecfg.batch, 1)
        n = len(plan_idx)

        answers: List[str] = []
        scores_entropy: List[float] = []
        plan = build_splice_plan(
            ids, ecfg.num_frames, len(ids) - 1 + ecfg.num_frames + ecfg.max_new_tokens
        )
        plan_np = stack_plans([plan] * chunk)
        qf = qv = None
        if query_feats is not None:
            qf, qv = self._broadcast_query_feats(query_feats, chunk)
        tp = _prof("s1_setup", tp)
        # dispatch every chunk asynchronously, then realize: the host-side
        # padding/transfer of chunk N+1 overlaps the device decode of chunk N
        pending = []
        for start in range(0, n, chunk):
            end = min(start + chunk, n)
            rows = plan_idx[start:end] if use_dg else windows[start:end]
            if len(rows) < chunk:  # pad the tail chunk to the compiled shape
                pad = np.repeat(rows[-1:], chunk - len(rows), axis=0)
                rows = np.concatenate([rows, pad], axis=0)
            pending.append((
                end - start,
                self._run_chunk(plan_np, rows, qf, qv, feats_dev=feats_dev),
            ))
        tp = _prof("s1_dispatch", tp)
        col = 0 if ecfg.score == "max_entropy" else 2
        for n_valid, out in pending:
            res = self._read_chunk(out)
            answers.extend(res.answers[:n_valid])
            scores_entropy.extend(res.entropy_stats[:n_valid, col].tolist())
        tp = _prof("s1_realize", tp)
        return self._stage1_finalize(
            answers, scores_entropy, plan_idx, features, windows, feats_dev,
            query_cls, tp,
        )

    def _stage1_finalize(
        self,
        answers: List[str],
        scores_entropy: List[float],
        plan_idx: np.ndarray,
        features: np.ndarray,
        windows: Optional[np.ndarray],
        feats_dev,
        query_cls: Optional[np.ndarray],
        tp: float,
    ) -> Dict[str, Any]:
        """Per-query scoring tail of ground_windows: proposal parsing, CLIP
        cosine, normalization + merge (reference eval_nlq_negative.py:307-337).
        Shared by the single-query and multi-query batched paths."""
        ecfg = self.eval_cfg
        use_dg = self._device_gather_enabled()
        n = len(plan_idx)

        # proposal parsing + CLIP cosine scoring (reference :307-320)
        frames: Dict[int, Tuple[int, int]] = {}
        for i, a in enumerate(answers):
            span = M.parse_span(a)
            if span is None:
                continue
            f, t = span
            if f == ecfg.num_frames - 1 and t == ecfg.num_frames - 1:
                continue
            frames[i] = (f, t)

        score_cos: List[float] = []
        if query_cls is not None and frames:
            # one batched scoring call for all proposals (per-proposal
            # dispatches measured ~1.7 s/query of host overhead at 7B scale)
            qc = jnp.asarray(query_cls, jnp.float32)
            maxlen = ecfg.num_frames
            d = features.shape[-1]
            P = len(frames)
            # bucket the proposal count so one compiled program serves every
            # query (a shape per P would recompile per query)
            Pb = 8
            while Pb < P:
                Pb *= 2
            valid = np.zeros((Pb, maxlen), bool)
            if use_dg:
                # proposal frames gathered on device from the resident movie
                prop_idx = np.zeros((Pb, maxlen), np.int32)
                for j, (i, (f, t)) in enumerate(frames.items()):
                    row = plan_idx[i][f : t + 1]
                    prop_idx[j, : len(row)] = row
                    valid[j, : len(row)] = True
                score_fn = self._compiled.setdefault(
                    ("cosine_gather", Pb, maxlen, d, feats_dev.shape),
                    jax.jit(
                        jax.vmap(
                            lambda q, feats, ir, va: proposal_cosine_scores(
                                q, jnp.where(va[:, None], feats[ir], 0.0), va, k=3
                            ),
                            in_axes=(None, None, 0, 0),
                        )
                    ),
                )
                scores_arr = np.asarray(score_fn(
                    qc, feats_dev, jnp.asarray(prop_idx), jnp.asarray(valid)
                ))
            else:
                padded = np.zeros((Pb, maxlen, d), np.float32)
                for j, (i, (f, t)) in enumerate(frames.items()):
                    prop = windows[i][f : t + 1].astype(np.float32)
                    padded[j, : len(prop)] = prop
                    valid[j, : len(prop)] = True
                score_fn = self._compiled.setdefault(
                    ("cosine", Pb, maxlen, d),
                    jax.jit(
                        jax.vmap(
                            lambda q, fr, va: proposal_cosine_scores(q, fr, va, k=3),
                            in_axes=(None, 0, 0),
                        )
                    ),
                )
                scores_arr = np.asarray(score_fn(qc, jnp.asarray(padded), jnp.asarray(valid)))
            # k=3 with validity masking equals the reference's k=min(len,3):
            # invalid top-k picks are zeroed before pooling
            score_cos = [float(x) for x in scores_arr[:P]]
        _prof("s1_score_cos", tp)

        if ecfg.normalize:
            if score_cos:
                m_s = max(score_cos)
                if m_s != 0:
                    score_cos = [e / m_s for e in score_cos]
            kept_entropy = [scores_entropy[i] for i in frames]
            if kept_entropy:
                m_s = max(kept_entropy)
                if m_s != 0:
                    kept_entropy = [e / m_s for e in kept_entropy]
        else:
            kept_entropy = [scores_entropy[i] for i in frames]

        if "entropy" in ecfg.score:
            if ecfg.score_merge == "add":
                scores = [a - b for a, b in zip(score_cos, kept_entropy)] if score_cos else [-e for e in kept_entropy]
            elif ecfg.score_merge == "multiply" and score_cos:
                scores = [a / b if b else a for a, b in zip(score_cos, kept_entropy)]
            else:
                scores = [-e for e in kept_entropy]
        else:
            scores = score_cos

        return {
            "answers": answers,
            "frames": frames,
            "scores": scores,
            "scores_entropy": scores_entropy,
            "score_cos": score_cos,
            "num_windows": n,
        }

    def ground_windows_batch(
        self,
        features: np.ndarray,
        queries: Sequence[Dict[str, Any]],
        question_key: str = "mad_grounding",
        movie_key=None,
    ) -> List[Dict[str, Any]]:
        """Dense grounding for MULTIPLE queries over one movie in shared
        chunks — the throughput mode (reference's equivalent is a 16-way
        SLURM job array, eval_nlq_negative.py:179-180; here queries batch
        into the same device programs instead).

        queries: each {"sentence": str, "query_feats": [Qt, d] | None,
        "query_cls": [d] | None}. Rows from all queries pack densely into
        chunks of eval_cfg.batch (a 57-window movie wastes 7/64 rows per
        query when queries are dispatched one at a time); per-row splice
        plans carry each query's prompt, and query features ride as one
        [Q, Qt, d] device stack gathered per row via the plan's qsel index.
        Results are identical to per-query ground_windows calls (rows are
        independent under right-padded attention); parity is pinned by
        tests/test_engine_batch.py.
        """
        ecfg = self.eval_cfg
        tp = time.time()
        Q = len(queries)
        if Q == 0:
            return []
        plan_idx = self._stage1_plan_idx(len(features))
        empty = {"answers": [], "scores_entropy": [], "score_cos": [], "frames": {}}
        if not len(plan_idx):
            return [dict(empty) for _ in range(Q)]

        use_dg = self._device_gather_enabled()
        feats_dev = self._features_to_device(features, movie_key) if use_dg else None
        windows = None if use_dg else features[plan_idx]

        chunk = max(ecfg.batch, 1)
        n = len(plan_idx)

        # per-query plans share ONE max_len (the longest prompt) so every
        # chunk compiles to the same shape; right-padding + per-row lengths
        # keep shorter prompts exact
        ids_list = [
            self._prompt_ids(q["sentence"], QUESTIONS[question_key])
            for q in queries
        ]
        max_len = max(len(i) for i in ids_list) - 1 + ecfg.num_frames \
            + ecfg.max_new_tokens
        plans = [
            build_splice_plan(ids, ecfg.num_frames, max_len) for ids in ids_list
        ]

        # query features -> one [Q, Qt, d] stack (padded to the longest)
        any_qf = any(q.get("query_feats") is not None for q in queries)
        if any_qf and not all(q.get("query_feats") is not None for q in queries):
            # an all-False query mask is NOT equivalent to the no-qf program
            # (T2V cross-attention over an empty set); batches must be
            # uniform — split them by qf presence instead
            raise ValueError(
                "ground_windows_batch: queries must uniformly have or lack "
                "query_feats"
            )
        qf_all = qv_all = None
        if any_qf:
            dtype = jnp.dtype(self.llama_cfg.dtype)
            qts = [
                0 if q.get("query_feats") is None else len(q["query_feats"])
                for q in queries
            ]
            qt = max(qts)
            d = features.shape[-1]
            qf_np = np.zeros((Q, qt, d), np.float32)
            qv_np = np.zeros((Q, qt), bool)
            for i, q in enumerate(queries):
                if qts[i]:
                    qf_np[i, : qts[i]] = q["query_feats"]
                    qv_np[i, : qts[i]] = True
            qf_all = jnp.asarray(qf_np, dtype)
            qv_all = jnp.asarray(qv_np)

        # global row list: query-major so same-query rows stay contiguous
        row_q = np.repeat(np.arange(Q, dtype=np.int32), n)
        row_w = np.tile(np.arange(n, dtype=np.int32), Q)
        total = Q * n
        tp = _prof("s1b_setup", tp)

        pending = []
        for start in range(0, total, chunk):
            end = min(start + chunk, total)
            sel_q = row_q[start:end]
            sel_w = row_w[start:end]
            if end - start < chunk:  # pad tail chunk to the compiled shape
                pad = chunk - (end - start)
                sel_q = np.concatenate([sel_q, np.repeat(sel_q[-1:], pad)])
                sel_w = np.concatenate([sel_w, np.repeat(sel_w[-1:], pad)])
            plan_np = stack_plans([plans[qi] for qi in sel_q])
            if qf_all is not None:
                plan_np["qsel"] = sel_q
            rows = plan_idx[sel_w] if use_dg else windows[sel_w]
            pending.append((
                end - start,
                self._run_chunk(plan_np, rows, qf_all, qv_all, feats_dev=feats_dev),
            ))
        tp = _prof("s1b_dispatch", tp)

        col = 0 if ecfg.score == "max_entropy" else 2
        answers_all: List[str] = []
        entropy_all: List[float] = []
        for n_valid, out in pending:
            res = self._read_chunk(out)
            answers_all.extend(res.answers[:n_valid])
            entropy_all.extend(res.entropy_stats[:n_valid, col].tolist())
        tp = _prof("s1b_realize", tp)

        results = []
        for qi, q in enumerate(queries):
            results.append(self._stage1_finalize(
                answers_all[qi * n : (qi + 1) * n],
                entropy_all[qi * n : (qi + 1) * n],
                plan_idx, features, windows, feats_dev,
                q.get("query_cls"), tp,
            ))
        return results

    def caption_windows(
        self,
        features: np.ndarray,
        prompt: Optional[str] = None,
        movie_key=None,
    ) -> Dict[str, Any]:
        """Dense captioning per window (the 'captioning' task of reference
        eval_nlq_negative.py:265-268 with the JSON-event prompt). Caption
        length is eval_cfg.max_new_tokens — raise it for this task."""
        ecfg = self.eval_cfg
        if prompt is None:
            prompt = (
                "Could you please describe the events in the video in detail? "
                "Be specific about the activities of individuals, their "
                "surroundings, and interactions with others. The output should "
                'be in JSON format, structured as follows: {"event": "xx", '
                '"timestamps": "from xx to xx"}.'
            )
        clip_length = int(ecfg.debug_window * ecfg.feature_fps)
        bounds = W.dense_window_bounds(len(features), clip_length)
        if not bounds:
            return {"answers": []}
        plan_idx = np.asarray(W.window_frame_indices(bounds, ecfg.num_frames), np.int32)
        use_dg = self._device_gather_enabled()
        feats_dev = self._features_to_device(features, movie_key) if use_dg else None
        windows = None if use_dg else features[plan_idx]

        full = CONV_VICUNA_V1.user_turn_prompt("<video>\n " + prompt)
        ids = tokenizer_image_token(full, self.tokenizer)
        chunk = max(ecfg.batch, 1)
        plan = build_splice_plan(
            ids, ecfg.num_frames, len(ids) - 1 + ecfg.num_frames + ecfg.max_new_tokens
        )
        plan_np = stack_plans([plan] * chunk)
        answers: List[str] = []
        for start in range(0, len(bounds), chunk):
            end = min(start + chunk, len(bounds))
            rows = plan_idx[start:end] if use_dg else windows[start:end]
            if len(rows) < chunk:
                rows = np.concatenate(
                    [rows, np.repeat(rows[-1:], chunk - len(rows), axis=0)], 0
                )
            res = self._read_chunk(
                self._run_chunk(plan_np, rows, None, None, feats_dev=feats_dev)
            )
            answers.extend(res.answers[: end - start])
        return {"answers": answers}

    # ---------------------------------------------------------------- stage 2

    @staticmethod
    def _stage2_row_bucket(n_pass: int) -> int:
        """Pick the smallest row-shape bucket that fits `n_pass` stage-2
        passes (REVISIONLLM_S2_ROW_BUCKETS). Pass counts above the largest
        bucket fall back to multiple async dispatches of that bucket."""
        buckets = sorted(
            int(b)
            for b in os.environ.get(
                "REVISIONLLM_S2_ROW_BUCKETS", "7,10,14"
            ).split(",")
        )
        fit = [b for b in buckets if b >= max(n_pass, 1)]
        return min(fit) if fit else max(buckets)

    def _stage2_passes(self, win_idx: np.ndarray, rng: np.random.Generator):
        """Assemble every (zoom, call) pass: each sees exactly ecfg.batch
        window tokens (windows repeated `zoom` times), so ALL multi-scale
        passes share one shape and run as ROWS of a single batched program —
        the reference issues one generate call per pass
        (eval_nlq_retrieval_e2e2.py:337-353); here a 100-window query with
        zooms [4,2,1] is one LLM call."""
        ecfg = self.eval_cfg
        starts: List[int] = []
        indexes: List[np.ndarray] = []
        hierarchy_zooms: List[int] = []
        call_in_zoom: List[int] = []  # the reference's inner-loop `i` (:339)
        row_idx: List[np.ndarray] = []  # [num_videos, T] frame idx per row

        V = len(win_idx)
        for zoom in ecfg.hierarchy_zooms:
            batch = max(ecfg.batch // zoom, 1)
            n_calls = int(np.ceil(V / batch))
            for i in range(n_calls):
                call_in_zoom.append(i)
                start = i * batch
                end = min(start + batch, V)
                if end - start < batch:
                    start = max(end - batch, 0)
                starts.append(start)
                row = win_idx[start : start + batch]
                if len(row) < batch:
                    row = np.concatenate(
                        [row, np.repeat(row[-1:], batch - len(row), axis=0)], 0
                    )
                perm = rng.permutation(row.shape[0])
                indexes.append(perm)
                row = row[perm]
                if zoom > 1:
                    row = np.repeat(row, zoom, axis=0)
                hierarchy_zooms.append(zoom)
                row_idx.append(row)
        return starts, indexes, hierarchy_zooms, call_in_zoom, row_idx

    def retrieve(
        self,
        features: np.ndarray,
        sentence: str,
        query_feats: Optional[np.ndarray] = None,
        query_cls: Optional[np.ndarray] = None,
        grounding_windows: Optional[List[int]] = None,
        rng: Optional[np.random.Generator] = None,
        question_key: str = "retrieval",
        movie_key=None,
    ) -> Dict[str, Any]:
        """Hierarchical coarse retrieval with multi-scale zoom passes.

        features: [ctx_l, 768]. One LLM call per zoom in hierarchy_zooms; each
        call sees eval_cfg.batch window-CLS tokens (reference
        eval_nlq_retrieval_e2e2.py:337-386). All window slicing, shuffling
        and zoom repetition happen in INDEX space; frames are gathered on
        device from the resident movie (see _device_gather_enabled).
        """
        ecfg = self.eval_cfg
        tp = time.time()
        rng = rng or np.random.default_rng(42)
        clip_length = int(ecfg.debug_window * ecfg.feature_fps)
        bounds = W.strided_window_bounds(len(features), clip_length, ecfg.stride)
        plan_idx = np.asarray(W.window_frame_indices(bounds, ecfg.num_frames), np.int32)
        win_idx = plan_idx  # [V, T] frame indices per window

        if grounding_windows is None:
            grounding_windows = list(range(len(win_idx)))
        else:
            win_idx = win_idx[np.asarray(grounding_windows, np.int32)]

        use_dg = self._device_gather_enabled()
        feats_dev = self._features_to_device(features, movie_key) if use_dg else None

        # the reference asks the RETRIEVAL question at eval while its stage-2
        # training data keeps the grounding question (train/dataset.py:489 is
        # commented out there) — a pretrained backbone absorbs the mismatch;
        # question_key lets small-model runs keep train == eval phrasing
        ids = self._prompt_ids(sentence, QUESTIONS[question_key])
        tp = _prof("s2_setup", tp)

        starts, indexes, hierarchy_zooms, call_in_zoom, row_idx = \
            self._stage2_passes(win_idx, rng)
        V = len(win_idx)
        num_videos = row_idx[0].shape[0] if row_idx else ecfg.batch
        plan = build_splice_plan(
            ids, num_videos, len(ids) - 1 + num_videos + ecfg.max_new_tokens
        )
        answers: List[str] = []
        mean_entropy: List[float] = []
        max_entropy: List[float] = []
        # All (zoom, call) passes are rows of ONE row-stacked program (padded
        # to a small set of shape buckets): decode is weight-bandwidth-bound,
        # so each extra dispatch re-reads the full int8 weight set per
        # generated token — three 3-row dispatches cost ~3x the decode of one
        # bucketed program (measured: e2e stage-2 938 -> ~450 ms/query,
        # BENCH_NOTES round 4). Bucket 7 = the pass count of a 100-window
        # query at zooms (4,2,1), the prefilter's top-up target; 10 covers
        # the dense-prefilter case (~150 windows). The row axis needs no
        # power of two (7 measured 9% faster than 8). Pass counts above the
        # largest bucket fall back to multiple async dispatches.
        row_batch = self._stage2_row_bucket(len(row_idx))
        plan_np = stack_plans([plan] * row_batch)
        qf = qv = None
        if query_feats is not None:
            qf, qv = self._broadcast_query_feats(query_feats, row_batch)
        tp = _prof("s2_plan", tp)
        pending = []
        for rstart in range(0, len(row_idx), row_batch):
            rows = row_idx[rstart : rstart + row_batch]
            n_rows = len(rows)
            if n_rows < row_batch:
                rows = rows + [rows[-1]] * (row_batch - n_rows)
            images = np.stack(rows, axis=0)  # [R, num_videos, T] idx or frames
            if not use_dg:
                images = features[images]  # [R, num_videos, T, d] host gather
            pending.append((
                n_rows, self._run_chunk(plan_np, images, qf, qv, feats_dev=feats_dev)
            ))
        tp = _prof("s2_dispatch", tp)
        for n_rows, out in pending:
            res = self._read_chunk(out)
            answers.extend(res.answers[:n_rows])
            for r in range(n_rows):
                max_entropy.append(1.0 / max(res.entropy_stats[r, 0], 1e-9))
                mean_entropy.append(1.0 / max(res.entropy_stats[r, 2], 1e-9))
        tp = _prof("s2_realize", tp)
        return self._stage2_finalize(
            answers, mean_entropy, max_entropy, starts, indexes,
            hierarchy_zooms, call_in_zoom, row_idx, grounding_windows, V,
            features, feats_dev, query_cls, tp,
        )

    def _stage2_finalize(
        self,
        answers: List[str],
        mean_entropy: List[float],
        max_entropy: List[float],
        starts: List[int],
        indexes: List[np.ndarray],
        hierarchy_zooms: List[int],
        call_in_zoom: List[int],
        row_idx: List[np.ndarray],
        grounding_windows: List[int],
        V: int,
        features: np.ndarray,
        feats_dev,
        query_cls: Optional[np.ndarray],
        tp: float,
    ) -> Dict[str, Any]:
        """Per-query scoring tail of retrieve — shared by the single-query
        and multi-query batched paths.

        CLIP cosine of each chosen window (reference
        eval_nlq_retrieval_e2e2.py:360-386): map the parsed answer back
        through permutation/zoom/pre-filter, then score the +-1 window
        neighborhood of the current pass's (permuted, zoom-repeated)
        features against the query CLS — one batched program for all
        proposals, like ground_windows' scorer."""
        use_dg = self._device_gather_enabled()
        score_cos: List[float] = []
        if query_cls is not None and answers:
            # per-pass row length: the reference clamps with the CURRENT
            # pass's len(feat[0]), which differs across passes when
            # eval batch is not divisible by a zoom factor (ADVICE r2)
            num_videos_rows = [ri.shape[0] for ri in row_idx]
            chosen = M.stage2_chosen_windows(
                answers, starts, indexes, hierarchy_zooms, call_in_zoom,
                grounding_windows, num_videos_rows,
            )
            to_score: List[np.ndarray] = []  # [T] frame-index rows
            for p, ns in enumerate(chosen):
                if ns:
                    for n2 in ns:
                        to_score.append(row_idx[p][n2])
            scores_flat: List[float] = []
            if to_score:
                T = to_score[0].shape[0]
                d = features.shape[-1]
                Pb = 8
                while Pb < len(to_score):
                    Pb *= 2
                valid = np.zeros((Pb, T), bool)
                valid[: len(to_score)] = True
                qc = jnp.asarray(query_cls, jnp.float32)
                if use_dg:
                    prop_idx = np.zeros((Pb, T), np.int32)
                    for j, ir in enumerate(to_score):
                        prop_idx[j] = ir
                    score_fn = self._compiled.setdefault(
                        ("cosine_gather", Pb, T, d, feats_dev.shape),
                        jax.jit(
                            jax.vmap(
                                lambda q, feats, ir, va: proposal_cosine_scores(
                                    q, jnp.where(va[:, None], feats[ir], 0.0), va, k=3
                                ),
                                in_axes=(None, None, 0, 0),
                            )
                        ),
                    )
                    arr = np.asarray(score_fn(
                        qc, feats_dev, jnp.asarray(prop_idx), jnp.asarray(valid)
                    ))
                else:
                    padded = np.zeros((Pb, T, d), np.float32)
                    for j, ir in enumerate(to_score):
                        padded[j] = features[ir]
                    score_fn = self._compiled.setdefault(
                        ("cosine", Pb, T, d),
                        jax.jit(
                            jax.vmap(
                                lambda q, fr, va: proposal_cosine_scores(q, fr, va, k=3),
                                in_axes=(None, 0, 0),
                            )
                        ),
                    )
                    arr = np.asarray(score_fn(qc, jnp.asarray(padded), jnp.asarray(valid)))
                scores_flat = [float(x) for x in arr[: len(to_score)]]
            it = iter(scores_flat)
            for ns in chosen:
                if ns is None:
                    score_cos.append(0.0)  # reference :366: torch.tensor([0])
                else:
                    score_cos.extend(next(it) for _ in ns)
        _prof("s2_score_cos", tp)

        return {
            "answers": answers,
            "starts": starts,
            "indexes": [idx.tolist() for idx in indexes],
            "hierarchy_zooms": hierarchy_zooms,
            "mean_entropy": mean_entropy,
            "max_entropy": max_entropy,
            "score_cos": score_cos,
            "grounding_windows": grounding_windows,
            "num_windows": V,
        }

    def retrieve_batch(
        self,
        features: np.ndarray,
        queries: Sequence[Dict[str, Any]],
        question_key: str = "retrieval",
        movie_key=None,
    ) -> List[Dict[str, Any]]:
        """Hierarchical retrieval for MULTIPLE queries over one movie as one
        row-stacked program (or as few bucket-shaped dispatches as fit) —
        the throughput mode. Decode is weight-bandwidth-bound: stacking Q
        queries' zoom passes into one program amortizes the full int8 weight
        read per generated token across all of them, the same win that
        collapsed the single query's zoom passes into one dispatch
        (BENCH_NOTES round 4).

        queries: each {"sentence": str, "query_feats": ..., "query_cls": ...,
        "grounding_windows": list | None, "rng": np.random.Generator | None}.
        Results match per-query retrieve calls exactly (per-query rngs drive
        the shuffles); parity pinned by tests/test_engine_batch.py. Extend
        REVISIONLLM_S2_ROW_BUCKETS (e.g. "7,10,14,28,40") so Q queries'
        passes fit one dispatch.
        """
        ecfg = self.eval_cfg
        tp = time.time()
        Q = len(queries)
        if Q == 0:
            return []
        clip_length = int(ecfg.debug_window * ecfg.feature_fps)
        bounds = W.strided_window_bounds(len(features), clip_length, ecfg.stride)
        plan_idx = np.asarray(
            W.window_frame_indices(bounds, ecfg.num_frames), np.int32
        )

        use_dg = self._device_gather_enabled()
        feats_dev = self._features_to_device(features, movie_key) if use_dg else None

        # per-query pass assembly (own grounding prefilter + rng each)
        per_q = []
        for qi, q in enumerate(queries):
            gw = q.get("grounding_windows")
            win_idx = plan_idx
            if gw is None:
                gw = list(range(len(plan_idx)))
            else:
                win_idx = plan_idx[np.asarray(gw, np.int32)]
            rng = q.get("rng") or np.random.default_rng(42)
            starts, indexes, zooms, calls, row_idx = self._stage2_passes(
                win_idx, rng
            )
            per_q.append((gw, len(win_idx), starts, indexes, zooms, calls, row_idx))

        num_videos = per_q[0][6][0].shape[0] if per_q[0][6] else ecfg.batch
        ids_list = [
            self._prompt_ids(q["sentence"], QUESTIONS[question_key])
            for q in queries
        ]
        max_len = max(len(i) for i in ids_list) - 1 + num_videos \
            + ecfg.max_new_tokens
        plans = [
            build_splice_plan(ids, num_videos, max_len) for ids in ids_list
        ]

        any_qf = any(q.get("query_feats") is not None for q in queries)
        if any_qf and not all(q.get("query_feats") is not None for q in queries):
            raise ValueError(
                "retrieve_batch: queries must uniformly have or lack "
                "query_feats"
            )
        qf_all = qv_all = None
        if any_qf:
            dtype = jnp.dtype(self.llama_cfg.dtype)
            qts = [len(q["query_feats"]) for q in queries]
            qt = max(qts)
            d = features.shape[-1]
            qf_np = np.zeros((Q, qt, d), np.float32)
            qv_np = np.zeros((Q, qt), bool)
            for i, q in enumerate(queries):
                qf_np[i, : qts[i]] = q["query_feats"]
                qv_np[i, : qts[i]] = True
            qf_all = jnp.asarray(qf_np, dtype)
            qv_all = jnp.asarray(qv_np)

        # flatten all queries' passes into one row list
        flat_rows: List[np.ndarray] = []
        flat_q: List[int] = []
        for qi, (_, _, _, _, _, _, row_idx) in enumerate(per_q):
            flat_rows.extend(row_idx)
            flat_q.extend([qi] * len(row_idx))
        total = len(flat_rows)
        row_batch = self._stage2_row_bucket(total)
        tp = _prof("s2b_plan", tp)

        pending = []
        for rstart in range(0, total, row_batch):
            rows = flat_rows[rstart : rstart + row_batch]
            sel_q = flat_q[rstart : rstart + row_batch]
            n_rows = len(rows)
            if n_rows < row_batch:
                rows = rows + [rows[-1]] * (row_batch - n_rows)
                sel_q = sel_q + [sel_q[-1]] * (row_batch - n_rows)
            plan_np = stack_plans([plans[qi] for qi in sel_q])
            if qf_all is not None:
                plan_np["qsel"] = np.asarray(sel_q, np.int32)
            images = np.stack(rows, axis=0)  # [R, num_videos, T] idx
            if not use_dg:
                images = features[images]  # [R, num_videos, T, d] host gather
            pending.append((
                n_rows,
                self._run_chunk(plan_np, images, qf_all, qv_all, feats_dev=feats_dev),
            ))
        tp = _prof("s2b_dispatch", tp)

        answers_all: List[str] = []
        mean_all: List[float] = []
        max_all: List[float] = []
        for n_rows, out in pending:
            res = self._read_chunk(out)
            answers_all.extend(res.answers[:n_rows])
            for r in range(n_rows):
                max_all.append(1.0 / max(res.entropy_stats[r, 0], 1e-9))
                mean_all.append(1.0 / max(res.entropy_stats[r, 2], 1e-9))
        tp = _prof("s2b_realize", tp)

        results = []
        off = 0
        for qi, (gw, V, starts, indexes, zooms, calls, row_idx) in enumerate(per_q):
            k = len(row_idx)
            results.append(self._stage2_finalize(
                answers_all[off : off + k], mean_all[off : off + k],
                max_all[off : off + k], starts, indexes, zooms, calls,
                row_idx, gw, V, features, feats_dev,
                queries[qi].get("query_cls"), tp,
            ))
            off += k
        return results

    # ------------------------------------------------------------- t2v eval

    def retrieve_videos(
        self,
        video_feats: np.ndarray,
        sentence: str,
        query_feats: Optional[np.ndarray] = None,
        query_cls: Optional[np.ndarray] = None,
        question_key: str = "retrieval",
        corpus_key=None,
    ) -> Dict[str, Any]:
        """Text->VIDEO retrieval over a candidate corpus (MSRVTT-style):
        candidates play the role stage-2 windows play — passes of
        eval_cfg.batch video tracks, 'In video N' / 'From i to j' answers
        mapped back to candidate ids, scored by inverse mean entropy and
        (optionally) query-CLS cosine.

        video_feats: [V, T, d] — each candidate already linspace-sampled to
        num_frames (the t2v dataset's sample_track, reference
        dataset.py:661-666). `corpus_key` caches the candidate stack on
        device across the whole query loop (the corpus is shared).
        """
        ecfg = self.eval_cfg
        V, T, d = video_feats.shape
        batch = max(ecfg.batch, 1)

        use_dg = self._device_gather_enabled()
        feats_dev = None
        if use_dg:
            flat = video_feats.reshape(V * T, d)
            feats_dev = self._features_to_device(flat, corpus_key)
        base_idx = np.arange(V * T, dtype=np.int32).reshape(V, T)

        ids = self._prompt_ids(sentence, QUESTIONS[question_key])
        plan = build_splice_plan(
            ids, batch, len(ids) - 1 + batch + ecfg.max_new_tokens
        )
        starts: List[int] = []
        pending = []
        n_pass = int(np.ceil(V / batch))
        plan_np = stack_plans([plan])
        for p in range(n_pass):
            start = min(p * batch, max(V - batch, 0))
            starts.append(start)
            rows = base_idx[start : start + batch]
            if len(rows) < batch:
                rows = np.concatenate(
                    [rows, np.repeat(rows[-1:], batch - len(rows), axis=0)], 0
                )
            images = rows[None]  # [1, batch, T] idx
            if not use_dg:
                images = video_feats.reshape(V * T, d)[images]
            qf = qv = None
            if query_feats is not None:
                qf = query_feats[None]
                qv = np.ones(qf.shape[:2], dtype=bool)
            pending.append(self._run_chunk(plan_np, images, qf, qv, feats_dev=feats_dev))

        answers: List[str] = []
        inv_entropy: List[float] = []
        for out in pending:
            res = self._read_chunk(out)
            answers.append(res.answers[0])
            inv_entropy.append(1.0 / max(res.entropy_stats[0, 2], 1e-9))

        chosen, scores = _map_retrieval_answers(
            answers, inv_entropy, starts, batch, V
        )
        if query_cls is not None and chosen:
            qc = jnp.asarray(query_cls, jnp.float32)
            cos: List[float] = []
            for cand in chosen:
                fr = jnp.asarray(video_feats[cand], jnp.float32)
                va = jnp.ones((T,), bool)
                cos.append(float(proposal_cosine_scores(qc, fr, va, k=3)))
            m = max(abs(c) for c in cos) or 1.0
            scores = [s * (c / m) for s, c in zip(scores, cos)]

        order = np.argsort(np.asarray(scores))[::-1] if scores else []
        ranked = [chosen[i] for i in order]
        return {
            "answers": answers,
            "ranked": ranked,
            "scores": [scores[i] for i in order],
            "num_candidates": V,
        }
