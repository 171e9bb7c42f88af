"""Utility-layer tests: metric logging, stage timing, host sharding."""

import json
import os

import numpy as np
import pytest


class TestMetricLogger:
    def test_jsonl_append(self, tmp_path):
        from revisionllm_tpu.utils.logging import MetricLogger

        path = str(tmp_path / "m.jsonl")
        log = MetricLogger(path, stream=None)
        log.log(step=1, loss=0.5)
        log.log(step=2, loss=0.25)
        lines = [json.loads(l) for l in open(path)]
        assert [l["step"] for l in lines] == [1, 2]
        assert all("time" in l for l in lines)

    def test_stage_timer_accumulates(self, tmp_path):
        from revisionllm_tpu.utils.logging import MetricLogger, StageTimer

        timer = StageTimer(MetricLogger(str(tmp_path / "t.jsonl"), stream=None))
        with timer.stage("fetch"):
            pass
        with timer.stage("fetch"):
            pass
        assert timer.totals["fetch"] >= 0.0
        lines = [json.loads(l) for l in open(tmp_path / "t.jsonl")]
        assert len(lines) == 2 and lines[0]["stage"] == "fetch"


class TestHostSharding:
    def test_single_host_covers_all(self):
        from revisionllm_tpu.parallel.launch import host_shard_indices

        r = host_shard_indices(10)
        assert list(r) == list(range(10))


class TestProfilerTrace:
    @pytest.mark.slow
    def test_trace_writes(self, tmp_path):
        import jax.numpy as jnp

        from revisionllm_tpu.utils.logging import profiler_trace

        with profiler_trace(str(tmp_path)):
            (jnp.ones(8) * 2).block_until_ready()
        # a plugins/profile dir should appear
        found = any("plugins" in dirs or "plugins" in root for root, dirs, _ in os.walk(tmp_path))
        assert found or len(list(os.walk(tmp_path))) > 1
