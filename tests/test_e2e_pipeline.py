"""End-to-end slice: stage-1 dense grounding + stage-2 retrieval + fusion over
synthetic MAD-style data with a tiny random model — the full L3->L5->L7
pipeline of SURVEY.md §7 running as one test."""

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.config import AdapterConfig, EvalConfig, LlamaConfig
from revisionllm_tpu.eval import fusion, metrics as M, stage1, stage2
from revisionllm_tpu.eval.engine import GroundingEngine
from revisionllm_tpu.models import llama, revisionllm

from test_dataset import FakeTokenizer


@pytest.fixture(scope="module")
def tiny_engine():
    cfg = LlamaConfig.tiny()
    cfg = cfg.__class__(**{**cfg.__dict__, "dtype": "float32"})
    adapter_cfg = AdapterConfig(
        d_model=16, num_heads=4, num_layers=2, ffn_dim=32,
        hidden_size=cfg.hidden_size, clip_adapter_text=True, hierarchy=False,
        feature_mode="temporal",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    vision = revisionllm.init_vision_params(adapter_cfg, jax.random.PRNGKey(1), d_in=16)
    eval_cfg = EvalConfig(
        debug_window=20, num_frames=16, feature_fps=2.0, batch=4, stride=2,
        max_new_tokens=6,
    )
    tok = FakeTokenizer()
    # pre-register digit words so decode round-trips
    for i in range(300):
        tok._id(str(i))
    return GroundingEngine(cfg, adapter_cfg, params, vision, tok, eval_cfg)


@pytest.fixture(scope="module")
def eval_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("eval")
    fps = 2.0
    dur = 200.0
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(int(dur * fps), 16)).astype(np.float32)
    np.save(root / "m1.npy", feats)
    data = {
        "q1": {
            "movie": "m1",
            "movie_duration": dur,
            "timestamps": [50.0, 60.0],
            "query": "a red car drives by.",
        },
        "q2": {
            "movie": "m1",
            "movie_duration": dur,
            "timestamps": [100.0, 110.0],
            "query": "someone opens a door?",
        },
    }
    with open(root / "val.json", "w") as f:
        json.dump(data, f)
    return root


class TestStage1E2E:
    def test_run_writes_jsonl(self, tiny_engine, eval_data, tmp_path):
        args = argparse.Namespace(
            data_path=str(eval_data / "val.json"),
            feat_folder=str(eval_data),
            q_feat_dir=None,
            log_path=str(tmp_path / "s1"),
            debug_window=20, num_frames=16, feature_fps=2.0,
            batch=4, split=0, total_split=1,
            score="mean_entropy", score_merge="multiply",
            normalize=True, topk_pool=True, skip_small_videos=True,
            mad_prompt="mad_grounding", max_new_tokens=6, debug=True,
        )
        out = stage1.run(args, tiny_engine)
        assert out["done"] == 2 and out["errors"] == 0
        logs = M.load_prediction_logs(str(tmp_path / "s1"), 1)
        assert len(logs) == 2
        rec = logs[0]
        assert set(rec) == {"video_id", "task", "query_id", "answer", "info"}
        assert "iou" in rec["info"] and "scores" in rec["info"]
        # 200s track at 2fps = 400 frames; window 40 frames -> 19 windows
        assert len(rec["answer"]) == 19

    def test_resume_skips_done(self, tiny_engine, eval_data, tmp_path):
        args_dict = dict(
            data_path=str(eval_data / "val.json"), feat_folder=str(eval_data),
            q_feat_dir=None, log_path=str(tmp_path / "s1r"),
            debug_window=20, num_frames=16, feature_fps=2.0,
            batch=4, split=0, total_split=1,
            score="mean_entropy", score_merge="multiply",
            normalize=True, topk_pool=True, skip_small_videos=True,
            mad_prompt="mad_grounding", max_new_tokens=6, debug=True,
        )
        out1 = stage1.run(argparse.Namespace(**args_dict), tiny_engine)
        out2 = stage1.run(argparse.Namespace(**args_dict), tiny_engine)
        assert out1["done"] == 2 and out2["done"] == 0


class TestStage2E2E:
    @pytest.mark.slow
    def test_run_and_fuse(self, eval_data, tmp_path):
        # hierarchy engine: CLS adapter
        cfg = LlamaConfig.tiny()
        cfg = cfg.__class__(**{**cfg.__dict__, "dtype": "float32"})
        adapter_cfg = AdapterConfig(
            d_model=16, num_heads=4, num_layers=2, ffn_dim=32,
            hidden_size=cfg.hidden_size, clip_adapter_text=True, hierarchy=True,
            feature_mode="cls",
        )
        params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        vision = revisionllm.init_vision_params(adapter_cfg, jax.random.PRNGKey(1), d_in=16)
        eval_cfg = EvalConfig(
            debug_window=20, num_frames=16, feature_fps=2.0, batch=8, stride=5,
            max_new_tokens=4, hierarchy_zooms=(2, 1),
        )
        tok = FakeTokenizer()
        for i in range(300):
            tok._id(str(i))
        engine = GroundingEngine(cfg, adapter_cfg, params, vision, tok, eval_cfg)

        args = argparse.Namespace(
            data_path=str(eval_data / "val.json"), feat_folder=str(eval_data),
            q_feat_dir=None, log_path=str(tmp_path / "s2"),
            grounding_path=None,
            debug_window=20, num_frames=16, feature_fps=2.0,
            batch=8, stride=5, split=0, total_split=1,
            distributed_retrieval=1, single=True,
            max_new_tokens=4, seed=42, debug=True,
        )
        out = stage2.run(args, engine)
        assert out["done"] == 2 and out["errors"] == 0
        logs = M.load_prediction_logs(str(tmp_path / "s2"), 1)
        assert len(logs) == 2
        info = logs[0]["info"]
        for k in ("gt", "frames", "iou", "mean_entropy", "max_entropy",
                  "hierarchy_zooms", "score_cos"):
            assert k in info
        # zoom passes: (2,1) over 8-batch
        assert set(info["hierarchy_zooms"]) <= {1, 2}

    def test_score_cos_populated_and_fused(self, tmp_path):
        """Stage-2 with query features logs non-empty score_cos (reference
        eval_nlq_retrieval_e2e2.py:367-386) and fusion consumes those logs."""
        cfg = LlamaConfig.tiny()
        cfg = cfg.__class__(**{**cfg.__dict__, "dtype": "float32"})
        adapter_cfg = AdapterConfig(
            d_model=16, num_heads=4, num_layers=2, ffn_dim=32,
            hidden_size=cfg.hidden_size, clip_adapter_text=True, hierarchy=True,
            feature_mode="cls",
        )
        params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        vision = revisionllm.init_vision_params(adapter_cfg, jax.random.PRNGKey(1), d_in=16)
        eval_cfg = EvalConfig(
            debug_window=20, num_frames=16, feature_fps=2.0, batch=8, stride=5,
            max_new_tokens=4, hierarchy_zooms=(2, 1),
        )
        tok = FakeTokenizer()
        for i in range(300):
            tok._id(str(i))
        engine = GroundingEngine(cfg, adapter_cfg, params, vision, tok, eval_cfg)

        # short movie so every window fits one batch (V=7 < batch=8): mapped
        # gw indices stay inside the pass's window axis, as in the real
        # 100-window geometry, so neighborhoods are never clamped empty
        root = tmp_path / "data"
        root.mkdir()
        rng = np.random.default_rng(7)
        feats_small = rng.normal(size=(64, 16)).astype(np.float32)
        np.save(root / "m1.npy", feats_small)
        with open(root / "val.json", "w") as f:
            json.dump({
                "q1": {"movie": "m1", "movie_duration": 32.0,
                       "timestamps": [10.0, 15.0], "query": "a red car."},
                "q2": {"movie": "m1", "movie_duration": 32.0,
                       "timestamps": [20.0, 25.0], "query": "a door opens?"},
            }, f)
        eval_data = root

        # query feature store: <qid>.npz with token/cls features
        qdir = tmp_path / "qfeats"
        qdir.mkdir()
        for qid in ("q1", "q2"):
            np.savez(
                qdir / f"{qid}.npz",
                token_features=rng.normal(size=(5, 16)).astype(np.float32),
                cls_features=rng.normal(size=(16,)).astype(np.float32),
            )

        # engine-level invariant: one 0.0 per unparsed pass, len(chosen)
        # scores per parsed pass — recomputed independently from the result
        feats = np.load(str(eval_data / "m1.npy"))
        from revisionllm_tpu.data.feature_store import QueryFeatureStore

        qf, qcls = QueryFeatureStore(str(qdir)).get("q1")
        res = engine.retrieve(feats, "a red car", qf, qcls,
                              rng=np.random.default_rng(42))
        n_pass = len(res["answers"])
        call_in_zoom = []
        for zoom in eval_cfg.hierarchy_zooms:
            batch = max(eval_cfg.batch // zoom, 1)
            n_calls = int(np.ceil(res["num_windows"] / batch))
            call_in_zoom.extend(range(n_calls))
        chosen = M.stage2_chosen_windows(
            res["answers"], res["starts"], res["indexes"],
            res["hierarchy_zooms"], call_in_zoom, res["grounding_windows"],
            eval_cfg.batch,
        )
        expect_n = sum(1 if ns is None else len(ns) for ns in chosen)
        assert len(res["score_cos"]) == expect_n
        assert all(isinstance(s, float) for s in res["score_cos"])

        # CLI path: JSONL carries the field; fusion over these logs works
        args = argparse.Namespace(
            data_path=str(eval_data / "val.json"), feat_folder=str(eval_data),
            q_feat_dir=str(qdir), log_path=str(tmp_path / "s2cos"),
            grounding_path=None,
            debug_window=20, num_frames=16, feature_fps=2.0,
            batch=8, stride=5, split=0, total_split=1,
            distributed_retrieval=1, single=True,
            max_new_tokens=4, seed=42, debug=True,
        )
        out = stage2.run(args, engine)
        assert out["done"] == 2 and out["errors"] == 0
        logs = M.load_prediction_logs(str(tmp_path / "s2cos"), 1)
        assert all(len(l["info"]["score_cos"]) > 0 for l in logs)

        gdir = tmp_path / "gcos"
        gdir.mkdir()
        with open(gdir / "predictions_streaming_0.txt", "w") as f:
            for qid in ("q1", "q2"):
                f.write(json.dumps({
                    "video_id": "m1", "task": "grounding", "query_id": qid,
                    "answer": ["From 1 to 2.", "Not Present"],
                    "info": {"iou": [0.7], "scores": [0.9]},
                }) + "\n")
        fused, ratio = M.fuse_retrieval_grounding(
            M.load_prediction_logs(str(gdir), 1), logs
        )
        assert len(fused) == 2 and 0.0 <= ratio <= 1.0


class TestFusionCLI:
    def test_fusion_main(self, tmp_path, capsys):
        g = tmp_path / "g"
        r = tmp_path / "r"
        g.mkdir(), r.mkdir()
        with open(g / "predictions_streaming_0.txt", "w") as f:
            f.write(json.dumps({
                "video_id": "m", "task": "grounding", "query_id": "q1",
                "answer": ["From 1 to 2.", "Not Present"],
                "info": {"iou": [0.8], "scores": [0.9]},
            }) + "\n")
        with open(r / "predictions_streaming_0.txt", "w") as f:
            f.write(json.dumps({
                "video_id": "m", "task": "grounding", "query_id": "q1",
                "answer": ["In video 0"],
                "info": {"frames": {"0": [0, 3]}, "iou": [1], "mean_entropy": [0.5],
                         "max_entropy": [0.5], "hierarchy_zooms": [1], "gt": [0]},
            }) + "\n")
        metrics = fusion.main([
            "--grounding_path", str(g), "--retrieval_path", str(r),
            "--distributed_grounding", "1", "--distributed_retrieval", "1",
        ])
        assert metrics["mIoU"] == pytest.approx(80.0)
        assert os.path.isfile(g / "result_retrieval.txt")


class TestCaptioning:
    def test_caption_windows(self, tiny_engine, eval_data):
        import numpy as np

        feats = np.load(str(eval_data / "m1.npy"))
        out = tiny_engine.caption_windows(feats)
        assert len(out["answers"]) == 19
        assert all(isinstance(a, str) for a in out["answers"])


class TestBaselineModes:
    def test_plus_baseline_appends_window(self, eval_data):
        from revisionllm_tpu.config import AdapterConfig, EvalConfig, LlamaConfig
        from revisionllm_tpu.eval.engine import GroundingEngine
        from revisionllm_tpu.models import llama as L, revisionllm as RV

        cfg = LlamaConfig(**{**LlamaConfig.tiny().__dict__, "dtype": "float32"})
        acfg = AdapterConfig(
            d_model=16, num_heads=4, num_layers=2, ffn_dim=32,
            hidden_size=cfg.hidden_size, clip_adapter_text=True, hierarchy=False,
            feature_mode="temporal",
        )
        params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        vision = RV.init_vision_params(acfg, jax.random.PRNGKey(1), d_in=16)
        tok = FakeTokenizer()
        for i in range(300):
            tok._id(str(i))
        ecfg = EvalConfig(
            debug_window=20, num_frames=16, feature_fps=2.0, batch=4, stride=2,
            max_new_tokens=4, plus_baseline=True,
        )
        engine = GroundingEngine(cfg, acfg, params, vision, tok, ecfg)
        feats = np.load(str(eval_data / "m1.npy"))
        res = engine.ground_windows(feats, "a dog")
        assert len(res["answers"]) == 20  # 19 windows + whole-movie window

        ecfg_b = EvalConfig(
            debug_window=20, num_frames=16, feature_fps=2.0, batch=4, stride=2,
            max_new_tokens=4, baseline=True,
        )
        engine_b = GroundingEngine(cfg, acfg, params, vision, tok, ecfg_b)
        res_b = engine_b.ground_windows(feats, "a dog")
        assert len(res_b["answers"]) == 1


class TestGroundingPrefilter:
    def test_stage2_with_grounding_path(self, eval_data, tmp_path):
        """Stage-2 pre-filtered by a stage-1 log (the --grounding_path flow,
        reference eval_nlq_retrieval_e2e2.py:278-294)."""
        import json as _json

        from revisionllm_tpu.config import AdapterConfig, EvalConfig, LlamaConfig
        from revisionllm_tpu.eval.engine import GroundingEngine
        from revisionllm_tpu.models import llama as L, revisionllm as RV

        # synthesize a stage-1 log: windows 0,3 are hits
        gdir = tmp_path / "g"
        gdir.mkdir()
        answers = ["Not Present"] * 19
        answers[0] = "From 1 to 5."
        answers[3] = "From 2 to 6."
        with open(gdir / "predictions_streaming_0.txt", "w") as f:
            for qid in ("q1", "q2"):
                f.write(_json.dumps({
                    "video_id": "m1", "task": "grounding", "query_id": qid,
                    "answer": answers, "info": {"iou": [0.5, 0.5], "scores": [1.0, 0.9]},
                }) + "\n")

        cfg = LlamaConfig(**{**LlamaConfig.tiny().__dict__, "dtype": "float32"})
        acfg = AdapterConfig(
            d_model=16, num_heads=4, num_layers=2, ffn_dim=32,
            hidden_size=cfg.hidden_size, clip_adapter_text=True, hierarchy=True,
            feature_mode="cls",
        )
        params = L.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        vision = RV.init_vision_params(acfg, jax.random.PRNGKey(1), d_in=16)
        tok = FakeTokenizer()
        for i in range(300):
            tok._id(str(i))
        ecfg = EvalConfig(
            debug_window=20, num_frames=16, feature_fps=2.0, batch=8, stride=5,
            max_new_tokens=4, hierarchy_zooms=(1,),
        )
        engine = GroundingEngine(cfg, acfg, params, vision, tok, ecfg)

        args = argparse.Namespace(
            data_path=str(eval_data / "val.json"), feat_folder=str(eval_data),
            q_feat_dir=None, log_path=str(tmp_path / "s2pf"),
            grounding_path=str(gdir),
            debug_window=20, num_frames=16, feature_fps=2.0,
            batch=8, stride=5, split=0, total_split=1,
            distributed_retrieval=1, single=True,
            max_new_tokens=4, seed=42, debug=True,
        )
        out = stage2.run(args, engine)
        assert out["done"] == 2 and out["errors"] == 0
        logs = M.load_prediction_logs(str(tmp_path / "s2pf"), 1)
        assert len(logs) == 2


class TestRowBucketSelection:
    """retrieve() row-stacks ALL zoom passes into the smallest fitting shape
    bucket (REVISIONLLM_S2_ROW_BUCKETS): one dispatch per bucket group, last
    group padded to its bucket. Decode is weight-bandwidth-bound, so dispatch
    count is the serving cost driver (BENCH_NOTES round 4)."""

    def _engine(self):
        from revisionllm_tpu.eval.engine import ChunkResult

        cfg = LlamaConfig.tiny()
        cfg = cfg.__class__(**{**cfg.__dict__, "dtype": "float32"})
        acfg = AdapterConfig(
            d_model=16, num_heads=4, num_layers=2, ffn_dim=32,
            hidden_size=cfg.hidden_size, clip_adapter_text=True,
            hierarchy=True, feature_mode="cls",
        )
        params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        vision = revisionllm.init_vision_params(
            acfg, jax.random.PRNGKey(1), d_in=16
        )
        ecfg = EvalConfig(
            debug_window=20, num_frames=16, feature_fps=2.0, batch=8,
            stride=5, max_new_tokens=4, hierarchy_zooms=(2, 1),
        )
        eng = GroundingEngine(cfg, acfg, params, vision, FakeTokenizer(), ecfg)
        calls = []

        def fake_run(plan_np, images, qf, qv, feats_dev=None):
            shape = tuple(np.asarray(images).shape)
            calls.append(shape)
            return shape[0]

        def fake_read(n):
            return ChunkResult(
                ["Not Present"] * n, np.ones((n, 4), np.float32)
            )

        eng._run_chunk = fake_run
        eng._read_chunk = fake_read
        return eng, calls

    # L=75 frames, clip 40, stride 5 (stride divides the window: step 8)
    # -> V=9 windows; zooms (2,1) over batch 8 -> ceil(9/4)+ceil(9/8) = 5
    # passes, each 8 window-rows
    def _feats(self):
        return np.zeros((75, 16), np.float32)

    def test_default_buckets_one_dispatch(self):
        eng, calls = self._engine()
        res = eng.retrieve(self._feats(), "a query")
        assert calls == [(7, 8, 16)]  # 5 passes padded to the 7-row bucket
        assert len(res["answers"]) == 5
        assert res["hierarchy_zooms"] == [2, 2, 2, 1, 1]

    def test_exact_bucket_no_padding(self, monkeypatch):
        monkeypatch.setenv("REVISIONLLM_S2_ROW_BUCKETS", "5,10")
        eng, calls = self._engine()
        res = eng.retrieve(self._feats(), "a query")
        assert calls == [(5, 8, 16)]
        assert len(res["answers"]) == 5

    def test_fallback_groups_of_max_bucket(self, monkeypatch):
        monkeypatch.setenv("REVISIONLLM_S2_ROW_BUCKETS", "2")
        eng, calls = self._engine()
        res = eng.retrieve(self._feats(), "a query")
        # 5 passes in groups of 2, tail padded
        assert calls == [(2, 8, 16), (2, 8, 16), (2, 8, 16)]
        assert len(res["answers"]) == 5
