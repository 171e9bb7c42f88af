"""Multi-query batched engine paths (ground_windows_batch / retrieve_batch)
must produce EXACTLY the per-query results of the single-query paths: rows
are independent under right-padded attention, per-query rngs drive the
stage-2 shuffles, and the qsel gather must route each row to its own query
features. This is the throughput mode (the reference's equivalent is a
16-way SLURM job array, eval_nlq_negative.py:179-180)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisionllm_tpu.config import AdapterConfig, EvalConfig, LlamaConfig
from revisionllm_tpu.eval.engine import GroundingEngine
from revisionllm_tpu.models import llama, revisionllm

from test_dataset import FakeTokenizer


def _make_engine(hierarchy=False, feature_mode="temporal", batch=4,
                 zooms=(2, 1)):
    cfg = LlamaConfig.tiny()
    cfg = cfg.__class__(**{**cfg.__dict__, "dtype": "float32"})
    acfg = AdapterConfig(
        d_model=16, num_heads=4, num_layers=2, ffn_dim=32,
        hidden_size=cfg.hidden_size, clip_adapter_text=True,
        hierarchy=hierarchy, feature_mode=feature_mode,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    vision = revisionllm.init_vision_params(acfg, jax.random.PRNGKey(1), d_in=16)
    ecfg = EvalConfig(
        debug_window=20, num_frames=16, feature_fps=2.0, batch=batch,
        stride=2, max_new_tokens=6, hierarchy_zooms=zooms,
    )
    tok = FakeTokenizer()
    for i in range(300):
        tok._id(str(i))
    return GroundingEngine(cfg, acfg, params, vision, tok, ecfg)


def _warm_vocab(eng, queries, question_key):
    """FakeTokenizer assigns word ids lazily; register every prompt's words
    up front so the single-query and batched runs decode generated ids
    through the SAME vocabulary (otherwise an id emitted by the model may
    be registered in one run order but not the other)."""
    from revisionllm_tpu.eval.engine import QUESTIONS

    for q in queries:
        eng._prompt_ids(q["sentence"], QUESTIONS[question_key])


@pytest.fixture(scope="module")
def movie():
    rng = np.random.default_rng(0)
    return rng.normal(size=(400, 16)).astype(np.float32)


@pytest.fixture(scope="module")
def queries():
    rng = np.random.default_rng(1)
    out = []
    for i, s in enumerate(
        ["a red car drives by.", "someone slowly opens the old door?"]
    ):
        qf = rng.normal(size=(3 + i, 16)).astype(np.float32)  # ragged Qt
        qc = rng.normal(size=(16,)).astype(np.float32)
        qc /= np.linalg.norm(qc)
        out.append({"sentence": s, "query_feats": qf, "query_cls": qc})
    return out


def _assert_stage1_equal(single, batched):
    assert single["answers"] == batched["answers"]
    assert single["frames"] == batched["frames"]
    assert single["num_windows"] == batched["num_windows"]
    for k in ("scores", "scores_entropy", "score_cos"):
        np.testing.assert_allclose(
            np.asarray(single[k], np.float64),
            np.asarray(batched[k], np.float64),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )


class TestGroundWindowsBatch:
    def test_parity_with_sequential(self, movie, queries):
        eng = _make_engine()
        _warm_vocab(eng, queries, "mad_grounding")
        singles = [
            eng.ground_windows(
                movie, q["sentence"], q["query_feats"], q["query_cls"],
                movie_key="m",
            )
            for q in queries
        ]
        batched = eng.ground_windows_batch(movie, queries, movie_key="m")
        assert len(batched) == len(queries)
        for s, b in zip(singles, batched):
            _assert_stage1_equal(s, b)

    def test_no_query_feats(self, movie, queries):
        eng = _make_engine()
        bare = [{"sentence": q["sentence"]} for q in queries]
        _warm_vocab(eng, bare, "mad_grounding")
        singles = [eng.ground_windows(movie, q["sentence"]) for q in bare]
        batched = eng.ground_windows_batch(movie, bare)
        for s, b in zip(singles, batched):
            assert s["answers"] == b["answers"]

    def test_mixed_qf_rejected(self, movie, queries):
        eng = _make_engine()
        mixed = [queries[0], {"sentence": "x"}]
        with pytest.raises(ValueError):
            eng.ground_windows_batch(movie, mixed)

    def test_empty(self, movie):
        assert _make_engine().ground_windows_batch(movie, []) == []


class TestRetrieveBatch:
    def test_parity_with_sequential(self, movie, queries):
        eng = _make_engine(hierarchy=True, feature_mode="cls")
        _warm_vocab(eng, queries, "retrieval")
        gws = [None, [0, 2, 3, 5, 7, 8]]
        singles = []
        for q, gw in zip(queries, gws):
            singles.append(eng.retrieve(
                movie, q["sentence"], q["query_feats"], q["query_cls"],
                grounding_windows=gw, rng=np.random.default_rng(11),
                movie_key="m",
            ))
        batched = eng.retrieve_batch(
            movie,
            [
                {**q, "grounding_windows": gw, "rng": np.random.default_rng(11)}
                for q, gw in zip(queries, gws)
            ],
            movie_key="m",
        )
        assert len(batched) == len(queries)
        for s, b in zip(singles, batched):
            assert s["answers"] == b["answers"]
            assert s["starts"] == b["starts"]
            assert s["indexes"] == b["indexes"]
            assert s["hierarchy_zooms"] == b["hierarchy_zooms"]
            assert s["grounding_windows"] == b["grounding_windows"]
            assert s["num_windows"] == b["num_windows"]
            for k in ("mean_entropy", "max_entropy", "score_cos"):
                np.testing.assert_allclose(
                    np.asarray(s[k], np.float64), np.asarray(b[k], np.float64),
                    rtol=1e-4, atol=1e-5, err_msg=k,
                )

    def test_bucket_splits_across_dispatches(self, movie, queries, monkeypatch):
        """Total passes above the largest bucket still produce exact
        per-query results (groups of the max bucket + tail padding)."""
        monkeypatch.setenv("REVISIONLLM_S2_ROW_BUCKETS", "3")
        eng = _make_engine(hierarchy=True, feature_mode="cls")
        _warm_vocab(eng, queries, "retrieval")
        singles = [
            eng.retrieve(
                movie, q["sentence"], q["query_feats"], q["query_cls"],
                rng=np.random.default_rng(7), movie_key="m",
            )
            for q in queries
        ]
        batched = eng.retrieve_batch(
            movie,
            [{**q, "rng": np.random.default_rng(7)} for q in queries],
            movie_key="m",
        )
        for s, b in zip(singles, batched):
            assert s["answers"] == b["answers"]


class TestCLIQueryBatch:
    def test_stage1_cli_query_batch_parity(self, tmp_path):
        """--query_batch 2 writes byte-identical prediction logs to the
        sequential path (same engine, same world)."""
        import argparse
        import json as _json
        import os

        from revisionllm_tpu.eval import stage1

        eng = _make_engine()
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(400, 16)).astype(np.float32)
        np.save(tmp_path / "m1.npy", feats)
        data = {
            f"q{i}": {
                "movie": "m1", "movie_duration": 200.0,
                "timestamps": [50.0, 60.0], "query": s,
            }
            for i, s in enumerate(["a red car drives by.", "a blue door opens."])
        }
        with open(tmp_path / "val.json", "w") as f:
            _json.dump(data, f)
        _warm_vocab(
            eng, [{"sentence": d["query"].strip(".?").lower()} for d in data.values()],
            "mad_grounding",
        )

        def run(qb, log):
            args = argparse.Namespace(
                data_path=str(tmp_path / "val.json"), feat_folder=str(tmp_path),
                q_feat_dir=None, log_path=str(tmp_path / log),
                debug_window=20, num_frames=16, feature_fps=2.0,
                batch=4, split=0, total_split=1,
                score="mean_entropy", score_merge="multiply",
                normalize=True, topk_pool=True, skip_small_videos=True,
                mad_prompt="mad_grounding", max_new_tokens=6, debug=True,
                query_batch=qb,
            )
            out = stage1.run(args, eng)
            assert out["errors"] == 0 and out["done"] == 2
            path = os.path.join(str(tmp_path / log), "predictions_streaming_0.txt")
            return [
                {k: v for k, v in _json.loads(l).items()}
                for l in open(path)
            ]

        seq = run(1, "s1")
        bat = run(2, "s2")
        assert seq == bat
