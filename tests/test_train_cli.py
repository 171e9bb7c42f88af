"""Train CLI smoke: tiny model over synthetic data, standard + stream modes,
checkpoint resume and reference-artifact export."""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def train_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("traindata")
    fps, dur = 2.0, 300.0
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
            "meta": {"duration": dur, "token": {"<s0>": 100.0 + k, "<e0>": 110.0 + k}},
            "source": "mad",
        }
        for k in range(6)
    ]
    with open(root / "train.json", "w") as f:
        json.dump(records, f)
    return root


def _run_cli(args_list, monkeypatch):
    from revisionllm_tpu.train import train_cli

    train_cli.main(args_list)


class TestTrainCli:
    @pytest.mark.slow
    def test_smoke_and_artifacts(self, train_data, tmp_path, monkeypatch):
        out_dir = str(tmp_path / "out")
        from revisionllm_tpu.train import train_cli

        train_cli.main([
            "--preset", "stage1_dense",
            "--data_path", str(train_data / "train.json"),
            "--feat_folder", str(train_data),
            "--output_dir", out_dir,
            "--tiny_model",
            "--max_steps", "2",
            "--per_device_batch_size", "2",
            "--save_steps", "2",
            "--log_steps", "1",
        ])
        assert os.path.isfile(os.path.join(out_dir, "train_log.jsonl"))
        assert os.path.isfile(os.path.join(out_dir, "adapter_model.bin"))
        assert os.path.isfile(os.path.join(out_dir, "adapter_config.json"))
        assert os.path.isfile(os.path.join(out_dir, "non_lora_trainables.bin"))
        with open(os.path.join(out_dir, "train_log.jsonl")) as f:
            logs = [json.loads(l) for l in f]
        assert all(np.isfinite(l["loss"]) for l in logs)
        # resume picks up from the checkpoint
        train_cli.main([
            "--preset", "stage1_dense",
            "--data_path", str(train_data / "train.json"),
            "--feat_folder", str(train_data),
            "--output_dir", out_dir,
            "--tiny_model",
            "--max_steps", "3",
            "--per_device_batch_size", "2",
            "--save_steps", "10",
            "--log_steps", "1",
        ])
        with open(os.path.join(out_dir, "train_log.jsonl")) as f:
            logs = [json.loads(l) for l in f]
        assert logs[-1]["step"] == 3

    @pytest.mark.slow
    def test_stream_mode(self, train_data, tmp_path):
        from revisionllm_tpu.train import train_cli

        out_dir = str(tmp_path / "stream_out")
        train_cli.main([
            "--preset", "stage1_stream",
            "--data_path", str(train_data / "train.json"),
            "--feat_folder", str(train_data),
            "--output_dir", out_dir,
            "--tiny_model",
            "--max_steps", "2",
            "--per_device_batch_size", "2",
            "--save_steps", "10",
            "--log_steps", "1",
        ])
        with open(os.path.join(out_dir, "train_log.jsonl")) as f:
            logs = [json.loads(l) for l in f]
        assert len(logs) == 2 and all(np.isfinite(l["loss"]) for l in logs)
