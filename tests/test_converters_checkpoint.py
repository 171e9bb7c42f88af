"""Dataset converter and checkpoint round-trip tests."""

import json
import os

import numpy as np
import pytest

from revisionllm_tpu.data import converters as C
from revisionllm_tpu.data.feature_store import RvfsStore


class TestMadConverter:
    def test_record_shape(self):
        mad = {
            "q1": {
                "movie": "m1",
                "sentence": "A dog runs.",
                "timestamps": [12.34, 56.78],
                "movie_duration": 3600.0,
            }
        }
        recs = C.mad_to_records(mad)
        assert len(recs) == 1
        r = recs[0]
        assert r["query_id"] == "q1" and r["id"] == "m1"
        assert r["conversations"][0]["value"] == (
            "<video>\nDuring which frames can we see a dog runs?"
        )
        assert r["conversations"][1]["value"] == "From <s0> to <e0>."
        assert r["meta"]["token"] == {"<s0>": 12.3, "<e0>": 56.8}
        assert r["source"] == "mad"

    def test_neg_duplicates(self):
        mad = {"q1": {"movie": "m", "sentence": "x", "timestamps": [0, 1], "movie_duration": 10}}
        assert len(C.mad_to_records(mad, neg=True)) == 2


class TestChaptersConverter:
    def test_windows(self):
        data = [
            {
                "vid": "v1",
                "duration": 1000.0,
                "query": ["intro part", "outro part."],
                "relevant_windows": [[[0.0, 30.0]], [[900.0, 1000.0]]],
            }
        ]
        recs = C.chapters_to_records(data)
        assert len(recs) == 2
        assert recs[0]["source"] == "vidchapters7m"
        assert recs[1]["meta"]["token"]["<s0>"] == 900.0
        assert recs[1]["conversations"][0]["value"].endswith("outro part?")


class TestStage2Miner:
    def test_extracts_grounding_pair(self):
        data = [
            {
                "id": "vid1",
                "conversations": [
                    {
                        "from": "human",
                        "value": "<video>\nDuring which frames can we see a cat jumping happening in the video?",
                    },
                    {"from": "gpt", "value": "From <s0> to <e0>."},
                ],
                "meta": {"duration": 100.0, "token": {"<s0>": 5.0, "<e0>": 9.0}},
            }
        ]
        recs = C.stage2_to_records(data)
        assert len(recs) == 1
        assert recs[0]["source"] == "stage2"
        assert "a cat jumping" in recs[0]["conversations"][0]["value"]

    def test_skips_caption_templates(self):
        data = [
            {
                "id": "vid1",
                "conversations": [
                    {
                        "from": "human",
                        "value": "Can you describe what occurred from <s0> to <e0 in the video?",
                    },
                    {"from": "gpt", "value": "things happened."},
                ],
                "meta": {"duration": 100.0, "token": {"<s0>": 5.0, "<e0>": 9.0}},
            }
        ]
        assert C.stage2_to_records(data) == []


class TestNpyToRvfs:
    def test_roundtrip(self, tmp_path):
        d = tmp_path / "npys"
        d.mkdir()
        a = np.random.default_rng(0).normal(size=(10, 4)).astype(np.float32)
        np.save(d / "vid1.npy", a)
        out = str(tmp_path / "out.rvfs")
        n = C.npy_dir_to_rvfs(str(d), out)
        assert n == 1
        np.testing.assert_array_equal(RvfsStore(out).get("vid1"), a)


class TestH5ToRvfs:
    """Parity role: reference data/convert_h5_to_lmdb.py:1-37 (the MAD CLIP
    features ship as one big h5 keyed by movie id)."""

    def test_roundtrip(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        rng = np.random.default_rng(1)
        feats = {
            "movie_a": rng.normal(size=(20, 8)).astype(np.float16),
            "movie_b": rng.normal(size=(7, 8)).astype(np.float32),
        }
        h5_path = str(tmp_path / "clip.h5")
        with h5py.File(h5_path, "w") as f:
            for k, v in feats.items():
                f.create_dataset(k, data=v)
        out = str(tmp_path / "out.rvfs")
        n = C.h5_to_rvfs(h5_path, out)
        assert n == 2
        store = RvfsStore(out)
        for k, v in feats.items():
            # reference casts to float32 on conversion
            np.testing.assert_array_equal(store.get(k), v.astype(np.float32))

    def test_single_key_and_cli(self, tmp_path, capsys):
        h5py = pytest.importorskip("h5py")
        a = np.ones((3, 4), np.float32)
        h5_path = str(tmp_path / "one.h5")
        with h5py.File(h5_path, "w") as f:
            f.create_dataset("only", data=a)
            f.create_dataset("skip", data=a * 2)
        out = str(tmp_path / "one.rvfs")
        C.main(["h52rvfs", "--in_path", h5_path, "--out_path", out,
                "--dataset_key", "only"])
        assert "wrote 1 records" in capsys.readouterr().out
        np.testing.assert_array_equal(RvfsStore(out).get("only"), a)


class TestCheckpointRoundtrip:
    def test_orbax_save_restore(self, tmp_path):
        import jax.numpy as jnp

        from revisionllm_tpu.train import checkpoint as ckpt

        state = {
            "trainable": {"w": jnp.arange(6.0).reshape(2, 3)},
            "opt_state": {"m": jnp.ones((2, 3))},
            "step": 7,
        }
        ckpt.save_checkpoint(str(tmp_path), state, 7)
        latest = ckpt.latest_checkpoint(str(tmp_path))
        assert latest.endswith("checkpoint-7")
        restored = ckpt.restore_checkpoint(latest, state)
        np.testing.assert_array_equal(
            np.asarray(restored["trainable"]["w"]), np.arange(6.0).reshape(2, 3)
        )
        assert int(restored["step"]) == 7

    def test_async_save_restore(self, tmp_path):
        """block=False save commits in the background; after
        wait_for_checkpoints the checkpoint restores exactly, even when the
        caller's references move on (the training-loop pattern: saved state
        must be host-copied synchronously per the orbax async contract).
        latest_checkpoint must never surface an uncommitted tmp dir."""
        import jax.numpy as jnp

        from revisionllm_tpu.train import checkpoint as ckpt

        state = {
            "trainable": {"w": jnp.arange(6.0).reshape(2, 3)},
            "opt_state": {"m": jnp.ones((2, 3))},
            "step": 3,
        }
        ckpt.save_checkpoint(str(tmp_path), state, 3, block=False)
        # caller moves on, as the train loop does after dispatching a save
        state = {
            "trainable": {"w": jnp.zeros((2, 3))},
            "opt_state": {"m": jnp.zeros((2, 3))},
            "step": 4,
        }
        ckpt.wait_for_checkpoints()
        latest = ckpt.latest_checkpoint(str(tmp_path))
        assert latest.endswith("checkpoint-3")
        restored = ckpt.restore_checkpoint(latest, state)
        np.testing.assert_array_equal(
            np.asarray(restored["trainable"]["w"]), np.arange(6.0).reshape(2, 3)
        )
        assert int(restored["step"]) == 3

    def test_reference_artifact_roundtrip(self, tmp_path):
        """export -> convert_peft_lora + convert_clip_adapter recovers the
        same trees (interop with the reference on-disk format)."""
        import jax
        import jax.numpy as jnp

        from revisionllm_tpu.config import AdapterConfig, LlamaConfig, LoraConfig
        from revisionllm_tpu.models import lora as lora_mod
        from revisionllm_tpu.models.adapter import init_adapter_params
        from revisionllm_tpu.models.convert import (
            _load_torch_state,
            convert_clip_adapter,
            convert_peft_lora,
        )
        from revisionllm_tpu.train import checkpoint as ckpt

        cfg = LlamaConfig.tiny()
        lcfg = LoraConfig(r=4, alpha=8, target_patterns=("q_proj", "v_proj"))
        lora = lora_mod.init_lora(cfg, lcfg, jax.random.PRNGKey(0))
        lora = jax.tree.map(lambda x: x + 0.5, lora)

        acfg = AdapterConfig(
            d_model=16, num_heads=4, num_layers=2, ffn_dim=32, hidden_size=64,
            clip_adapter_text=True,
        )
        vision = init_adapter_params(acfg, jax.random.PRNGKey(1))

        out = str(tmp_path / "artifacts")
        ckpt.export_reference_artifacts(out, lora, lcfg, {"mm_projector": vision})

        lora2, lcfg2 = convert_peft_lora(out, cfg)
        assert lcfg2.r == 4
        np.testing.assert_allclose(
            np.asarray(lora["layers"]["q_proj"]["a"]),
            lora2["layers"]["q_proj"]["a"], rtol=1e-6,
        )

        raw = _load_torch_state(os.path.join(out, "non_lora_trainables.bin"))
        vision2 = convert_clip_adapter(raw, acfg)
        np.testing.assert_allclose(
            np.asarray(vision["enc_layers"][0]["wq"]["w"]),
            vision2["enc_layers"][0]["wq"]["w"], rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(vision["global_token"]), vision2["global_token"], rtol=1e-6
        )


class TestAnalysis:
    def test_stats_and_check(self, tmp_path):
        from revisionllm_tpu.data import analysis as A

        recs = [
            {"id": "v1", "meta": {"duration": 100.0, "token": {"<s0>": 5.0, "<e0>": 9.0}}},
            {"id": "v2/clip.mp4", "meta": {"duration": 200.0, "token": {"<s0>": 1.0, "<e0>": 3.0}}},
        ]
        s = A.stats(recs)
        assert s["num_records"] == 2 and s["duration_max"] == 200.0
        assert s["gt_len_mean"] == pytest.approx(3.0)

        d = tmp_path / "feats"
        d.mkdir()
        np.save(d / "v1.npy", np.zeros((50, 4), np.float32))
        result = A.check(recs, str(d), num_frames=10)
        assert "v2/clip.mp4" in result["missing"]
        assert result["checked"] == 2

        fixed = A.reformat_ids(recs)
        assert fixed[1]["id"] == "clip"
