"""Dataset / preprocessing / collator / feature-store tests over synthetic
MAD-style records."""

import json
import os

import numpy as np
import pytest

from revisionllm_tpu.config import DataConfig
from revisionllm_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from revisionllm_tpu.data.collator import Collator
from revisionllm_tpu.data.dataset import GroundingDataset
from revisionllm_tpu.data.feature_store import (
    NpyFeatureStore,
    QueryFeatureStore,
    RvfsStore,
    RvfsWriter,
    open_feature_store,
)
from revisionllm_tpu.data.preprocess import preprocess_v1, render_v1


from revisionllm_tpu.utils.testing import FakeTokenizer  # noqa: F401  (shared fixture)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("mad")
    fps, dur = 5.0, 600.0
    feats = np.random.default_rng(0).normal(size=(int(dur * fps), 16)).astype(np.float32)
    np.save(root / "movie1.npy", feats)

    records = [
        {
            "id": "movie1",
            "query_id": f"q{k}",
            "conversations": [
                {"from": "human", "value": "<video>\nDuring which frames can we see a dog?"},
                {"from": "gpt", "value": "From <s0> to <e0>."},
            ],
            "meta": {"duration": dur, "token": {"<s0>": 200.0 + k, "<e0>": 210.0 + k}},
            "source": "mad",
        }
        for k in range(4)
    ]
    with open(root / "train.json", "w") as f:
        json.dump(records, f)

    # query feature store (rvfs)
    with RvfsWriter(str(root / "queries.rvfs")) as w:
        for k in range(4):
            w.add(
                f"q{k}",
                {
                    "token_features": np.random.default_rng(k).normal(size=(7, 16)).astype(np.float32),
                    "cls_features": np.random.default_rng(k + 100).normal(size=(16,)).astype(np.float32),
                },
            )
    return root


class TestFeatureStore:
    def test_rvfs_roundtrip(self, tmp_path):
        path = str(tmp_path / "x.rvfs")
        a = np.arange(12, dtype=np.float32).reshape(3, 4)
        b = np.arange(5, dtype=np.int32)
        with RvfsWriter(path) as w:
            w.add("k1", {"features": a})
            w.add("k2", {"token_features": b.astype(np.float32), "cls_features": a[0]})
        s = RvfsStore(path)
        np.testing.assert_array_equal(s.get("k1"), a)
        rec = s.get_record("k2")
        np.testing.assert_array_equal(rec["cls_features"], a[0])
        assert "k1" in s and "zzz" not in s

    def test_npy_store(self, data_dir):
        s = open_feature_store(str(data_dir))
        assert isinstance(s, NpyFeatureStore)
        assert s.get("movie1").shape[0] == 3000

    def test_query_store_normalizes_cls(self, data_dir):
        qs = QueryFeatureStore(str(data_dir / "queries.rvfs"))
        tok, cls = qs.get("q0")
        assert tok.shape == (7, 16)
        assert np.linalg.norm(cls) == pytest.approx(1.0, rel=1e-3)


class TestPreprocess:
    def test_labels_mask_human_turn(self):
        tok = FakeTokenizer()
        convs = [
            {"from": "human", "value": "<video> when does it happen"},
            {"from": "gpt", "value": "From 10 to 20."},
        ]
        out = preprocess_v1(convs, tok)
        ids, labels = out["input_ids"], out["labels"]
        assert IMAGE_TOKEN_INDEX in ids.tolist()
        answer_ids = [tok.vocab[w] for w in "From 10 to 20.".split()]
        supervised = labels[labels != IGNORE_INDEX].tolist()
        for a in answer_ids:
            assert a in supervised
        # question tokens masked
        q_id = tok.vocab["when"]
        pos = ids.tolist().index(q_id)
        assert labels[pos] == IGNORE_INDEX

    def test_render_v1_shape(self):
        convs = [
            {"from": "human", "value": "hi"},
            {"from": "gpt", "value": "hello"},
        ]
        text = render_v1(convs)
        assert text.endswith("ASSISTANT: hello</s>")


class TestDataset:
    def _cfg(self, data_dir, **kw):
        base = dict(
            data_path=str(data_dir / "train.json"),
            feat_folder=str(data_dir),
            q_feat_dir=str(data_dir / "queries.rvfs"),
            vis_feat_storage="npy",
            num_frames=64,
            feature_fps=5.0,
            debug_window=100,
        )
        base.update(kw)
        return DataConfig(**base)

    def test_positive_item(self, data_dir):
        ds = GroundingDataset(
            str(data_dir / "train.json"), FakeTokenizer(),
            self._cfg(data_dir), rng=np.random.default_rng(0), debug=True,
        )
        item = ds[0]
        assert item["image"].shape == (64, 16)
        assert IMAGE_TOKEN_INDEX in item["input_ids"].tolist()
        # answer contains two-digit frame tokens within range
        assert "query_feat" in item
        s, e = item["start_end_frame"]
        assert 0 <= s <= e <= 63

    def test_negative_item_answer(self, data_dir):
        ds = GroundingDataset(
            str(data_dir / "train.json"), FakeTokenizer(),
            self._cfg(data_dir), rng=np.random.default_rng(1), debug=True,
        )
        item = ds.getitem(0, neg=True)
        text = " ".join(
            ds.tokenizer.inv.get(int(t), "?") for t in item["input_ids"] if int(t) > 2
        )
        assert "Not Present" in text.replace("Not Present", "Not Present") or "Not" in text

    def test_neg_window_synthesis(self, data_dir):
        cfg = self._cfg(data_dir, neg_window=True, neg_samples=0.5, neg_factor=1)
        ds = GroundingDataset(
            str(data_dir / "train.json"), FakeTokenizer(), cfg,
            rng=np.random.default_rng(2), debug=True,
        )
        # 4 records + 2 negatives
        assert len(ds) == 6

    def test_hierarchy_assembly(self, data_dir):
        cfg = self._cfg(
            data_dir, hierarchy=True, hierarchy_num_videos=6, debug_window=100
        )
        ds = GroundingDataset(
            str(data_dir / "train.json"), FakeTokenizer(), cfg,
            rng=np.random.default_rng(3), debug=True,
        )
        item = ds[0]
        # [V, T, d] window stack
        assert item["image"].shape == (6, 64, 16)

    def test_stream_pairs(self, data_dir):
        cfg = self._cfg(data_dir, stream=True)
        ds = GroundingDataset(
            str(data_dir / "train.json"), FakeTokenizer(), cfg,
            rng=np.random.default_rng(4), debug=True,
        )
        item = ds[0]
        assert "clip2" in item and "neg" in item

    def test_deterministic_with_seed(self, data_dir):
        mk = lambda seed: GroundingDataset(
            str(data_dir / "train.json"), FakeTokenizer(),
            self._cfg(data_dir), rng=np.random.default_rng(seed), debug=True,
        )[0]
        a, b = mk(7), mk(7)
        np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
        np.testing.assert_array_equal(a["image"], b["image"])


class TestCollator:
    def test_batch_shapes(self, data_dir):
        ds = GroundingDataset(
            str(data_dir / "train.json"), FakeTokenizer(),
            DataConfig(
                data_path=str(data_dir / "train.json"), feat_folder=str(data_dir),
                q_feat_dir=str(data_dir / "queries.rvfs"), vis_feat_storage="npy",
                num_frames=64, feature_fps=5.0, debug_window=100,
            ),
            rng=np.random.default_rng(5), debug=True,
        )
        coll = Collator(max_len=128, num_video_tokens=64)
        batch = coll([ds[0], ds[1]])
        assert batch["text_ids"].shape == (2, 128)
        assert batch["images"].shape == (2, 64, 16)
        assert batch["query_feats"].shape == (2, 25, 16)
        assert batch["iteration_step"] == 0
        batch2 = coll([ds[0], ds[1]])
        assert batch2["iteration_step"] == 1


class TestAlternate:
    def test_alternate_switches_batch_structure(self, data_dir):
        cfg = DataConfig(
            data_path=str(data_dir / "train.json"), feat_folder=str(data_dir),
            q_feat_dir=str(data_dir / "queries.rvfs"), vis_feat_storage="npy",
            num_frames=64, feature_fps=5.0, debug_window=100,
            hierarchy=True, hierarchy_num_videos=4,
            clip_adapter_feature="alternate",
        )
        ds = GroundingDataset(
            str(data_dir / "train.json"), FakeTokenizer(), cfg,
            rng=np.random.default_rng(0), debug=True,
        )
        ds.iteration_step = 0
        even = ds[0]
        assert even["image"].ndim == 3  # [V, T, d] hierarchy batch
        ds.iteration_step = 1
        odd = ds[0]
        assert odd["image"].ndim == 2   # [T, d] plain temporal batch


class TestT2V:
    def test_msrvtt_hierarchy_sampling(self, data_dir, tmp_path):
        # extra candidate videos + the csv listing
        for k in range(2, 6):
            feats = np.random.default_rng(k).normal(size=(200, 16)).astype(np.float32)
            np.save(data_dir / f"vid{k}.npy", feats)
        csv_path = tmp_path / "t2v.csv"
        with open(csv_path, "w") as f:
            f.write("video_id\n" + "\n".join([f"vid{k}" for k in range(2, 6)] + ["movie1"]))

        records = [
            {
                "id": "movie1",
                "query_id": "q0",
                "conversations": [
                    {"from": "human", "value": "<video>\nDuring which video can we see a dog?"},
                    {"from": "gpt", "value": "yes"},
                ],
                "source": "msrvtt",
            }
        ]
        import json as _json

        rec_path = tmp_path / "msrvtt.json"
        with open(rec_path, "w") as f:
            _json.dump(records, f)

        cfg = DataConfig(
            data_path=str(rec_path), feat_folder=str(data_dir),
            vis_feat_storage="npy", num_frames=32, hierarchy=True,
            hierarchy_num_videos=4, t2v=str(csv_path),
        )
        ds = GroundingDataset(
            str(rec_path), FakeTokenizer(), cfg,
            rng=np.random.default_rng(0), debug=True,
        )
        item = ds[0]
        assert item["image"].shape == (4, 32, 16)
        text = " ".join(
            ds.tokenizer.inv.get(int(t), "?") for t in item["input_ids"] if int(t) > 2
        )
        assert "In video" in text

    def test_msrvtt_flat_negative(self, data_dir, tmp_path):
        for k in range(2, 4):
            np.save(data_dir / f"nvid{k}.npy",
                    np.random.default_rng(k).normal(size=(100, 16)).astype(np.float32))
        csv_path = tmp_path / "t2v2.csv"
        with open(csv_path, "w") as f:
            f.write("video_id\nnvid2\nnvid3\nmovie1\n")
        records = [
            {
                "id": "movie1",
                "conversations": [
                    {"from": "human", "value": "<video>\nDoes a dog happen in the video?"},
                    {"from": "gpt", "value": "Not Present"},
                ],
                "source": "msrvtt",
            }
        ]
        import json as _json

        rec_path = tmp_path / "msrvtt2.json"
        with open(rec_path, "w") as f:
            _json.dump(records, f)
        cfg = DataConfig(
            data_path=str(rec_path), feat_folder=str(data_dir),
            vis_feat_storage="npy", num_frames=16, hierarchy=False,
            t2v=str(csv_path),
        )
        ds = GroundingDataset(
            str(rec_path), FakeTokenizer(), cfg,
            rng=np.random.default_rng(1), debug=True,
        )
        item = ds[0]
        assert item["image"].shape == (16, 16)


class TestCropInvariants:
    """Property tests over many seeds: the random crop must always contain the
    GT, and the substituted answer tokens must be in-range two-digit frame
    indices (reference dataset.py:778-832 semantics)."""

    def test_gt_inside_crop_many_seeds(self, data_dir):
        import re

        for seed in range(12):
            cfg = DataConfig(
                data_path=str(data_dir / "train.json"), feat_folder=str(data_dir),
                q_feat_dir=str(data_dir / "queries.rvfs"), vis_feat_storage="npy",
                num_frames=64, feature_fps=5.0, debug_window=100,
            )
            ds = GroundingDataset(
                str(data_dir / "train.json"), FakeTokenizer(), cfg,
                rng=np.random.default_rng(seed), debug=True,
            )
            item = ds[seed % 4]
            s, e = item["start_end_frame"]
            # frame-token range
            assert 0 <= s <= e <= cfg.num_frames - 1
            # answer text contains exactly those two-digit tokens
            text = " ".join(
                ds.tokenizer.inv.get(int(t), "?") for t in item["input_ids"] if int(t) > 2
            )
            m = re.search(r"From (\d+) to (\d+)", text)
            assert m and int(m.group(1)) == s and int(m.group(2)) == e

    def test_negative_answer_rewritten(self, data_dir):
        for seed in range(6):
            cfg = DataConfig(
                data_path=str(data_dir / "train.json"), feat_folder=str(data_dir),
                q_feat_dir=str(data_dir / "queries.rvfs"), vis_feat_storage="npy",
                num_frames=64, feature_fps=5.0, debug_window=100,
            )
            ds = GroundingDataset(
                str(data_dir / "train.json"), FakeTokenizer(), cfg,
                rng=np.random.default_rng(100 + seed), debug=True,
            )
            item = ds.getitem(seed % 4, neg=True)
            text = " ".join(
                ds.tokenizer.inv.get(int(t), "?") for t in item["input_ids"] if int(t) > 2
            )
            assert "Not Present" in text
