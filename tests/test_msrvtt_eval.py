"""MSRVTT text->video retrieval eval CLI (the last §2.4 inventory row).

Mechanical end-to-end coverage: corpus ranking runs through the real loader/
engine/CLI with a tiny random checkpoint, produces the JSONL + result_t2v
artifacts, computes R@K/MedR, and resumes from its own log.
"""

import json
import os

import numpy as np
import pytest

pytest.importorskip("transformers")
pytest.importorskip("torch")


@pytest.fixture(scope="module")
def t2v_world(tmp_path_factory):
    from revisionllm_tpu.data.synthetic import build_tiny_hf_checkpoint

    root = tmp_path_factory.mktemp("t2v")
    hf = str(root / "hf")
    build_tiny_hf_checkpoint(hf, hidden_size=64, num_layers=2)

    rng = np.random.default_rng(0)
    feat_dir = root / "feats"
    qdir = root / "queries"
    feat_dir.mkdir()
    qdir.mkdir()
    queries = {}
    for i in range(6):
        vid = f"video{i}"
        track = rng.normal(size=(40, 16)).astype(np.float32)
        np.save(feat_dir / f"{vid}.npy", track)
        qid = f"q{i}"
        queries[qid] = {"video": vid, "sentence": f"pattern {i}."}
        cls = rng.normal(size=(16,)).astype(np.float32)
        np.savez(qdir / f"{qid}.npz",
                 token_features=rng.normal(size=(4, 16)).astype(np.float32),
                 cls_features=cls)
    qjson = root / "queries.json"
    with open(qjson, "w") as f:
        json.dump(queries, f)

    # a random ClipEncoder in the reference artifact format
    import jax

    from revisionllm_tpu.config import AdapterConfig
    from revisionllm_tpu.models import revisionllm
    from revisionllm_tpu.train.checkpoint import export_reference_artifacts

    acfg = AdapterConfig(
        kind="clip_encoder", d_model=16, num_heads=4, num_layers=2,
        ffn_dim=32, hidden_size=64, clip_adapter_text=True,
        hierarchy=True, feature_mode="cls",
    )
    vision = revisionllm.init_vision_params(acfg, jax.random.PRNGKey(5), d_in=16)
    art = root / "artifact"
    export_reference_artifacts(str(art), None, None, vision=vision)
    return {"hf": hf, "feats": str(feat_dir), "queries": str(qdir),
            "data": str(qjson), "root": root,
            "adapter": str(art / "non_lora_trainables.bin")}


class TestMsrvttEval:
    def test_ranking_end_to_end_and_resume(self, t2v_world, tmp_path):
        from revisionllm_tpu.eval import msrvtt

        log_dir = str(tmp_path / "logs")
        args = [
            "--model_base", t2v_world["hf"],
            "--pretrain_clip_adapter", t2v_world["adapter"],
            "--data_path", t2v_world["data"],
            "--feat_folder", t2v_world["feats"],
            "--q_feat_dir", t2v_world["queries"],
            "--log_path", log_dir,
            "--num_frames", "8", "--batch", "3", "--max_new_tokens", "6",
            "--adapter_d_model", "16", "--adapter_heads", "4",
            "--adapter_layers", "2", "--adapter_ffn", "32",
            "--retrieval_prompt", "retrieval",
            "--debug", "True",
        ]
        metrics = msrvtt.main(args)
        assert os.path.isfile(os.path.join(log_dir, "result_t2v.json"))
        logs = [json.loads(l) for l in open(
            os.path.join(log_dir, "predictions_streaming_0.txt"))]
        assert {l["query_id"] for l in logs} == {f"q{i}" for i in range(6)}
        for l in logs:
            info = l["info"]
            assert 1 <= info["rank"] <= 6
            assert all(0 <= c < 6 for c in info["ranked"])
        assert metrics["n"] == 6
        assert 0.0 <= metrics["R@1"] <= 100.0
        assert metrics["MedR"] >= 1

        # resume: a second run must skip all done queries (log unchanged)
        before = open(os.path.join(log_dir, "predictions_streaming_0.txt")).read()
        msrvtt.main(args)
        after = open(os.path.join(log_dir, "predictions_streaming_0.txt")).read()
        assert before == after


def test_map_retrieval_answers_dedup_and_padded_slots():
    """Tail-pass overlap + padded rows (advisor round-4): duplicate
    candidates keep only their best score; an answer pointing at a padded
    slot clamps to the real candidate it duplicates (never dropped)."""
    from revisionllm_tpu.eval.engine import _map_retrieval_answers

    # V=5 candidates, batch=3 -> passes at starts [0, 2] (tail overlaps 2).
    # Pass 0 answers candidate 2; pass 1 answers row 0 -> candidate 2 again
    # with a HIGHER score: dedup keeps 2 once, at the better score.
    chosen, scores = _map_retrieval_answers(
        ["In video 2.", "In video 0."], [1.0, 4.0], [0, 2], 3, 5
    )
    assert chosen == [2] and scores == [4.0]

    # V=2 < batch=3: rows padded by repeating candidate 1. An answer at the
    # padded slot (row 2) maps to candidate 1, not dropped via cand >= V.
    chosen, scores = _map_retrieval_answers(["In video 2."], [2.5], [0], 3, 2)
    assert chosen == [1] and scores == [2.5]

    # Unparseable answers are skipped.
    chosen, scores = _map_retrieval_answers(["nope"], [1.0], [0], 3, 5)
    assert chosen == [] and scores == []
