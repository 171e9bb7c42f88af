"""Streaming-memory LEARNING proof (VERDICT r4 #4).

Runs scripts/stream_memory_demo.py at reduced step counts: the stream corpus
makes the grounding target resolvable ONLY through clip-1 memory (generic
query + same-class decoys flanking the target), so a model that beats the
no-memory ablation by a wide margin must be READING the pooled memory tokens
injected at the <memory> sentinel — the reference's stream mode
(vtimellm_trainer.py:78-129, vtimellm_arch.py:208-232) demonstrated as
learning, not just as a loss that computes.
"""

import json
import os
import sys

import pytest

pytest.importorskip("transformers")
pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.mark.slow
def test_stream_memory_beats_no_memory_ablation(tmp_path):
    import stream_memory_demo

    wd = str(tmp_path / "demo")
    rc = stream_memory_demo.main([
        "--work_dir", wd,
        "--steps", "2000",
        "--ablation_steps", "2000",
        "--memory_types", "gt_mean_pool",  # one memory type in the fast pass
        # full-budget margin measured 15.7 pts (n=64, 1sigma_diff ~8.8
        # unpaired; LEARNING.md stream section) — the reduced-budget lane
        # asserts a floor comfortably above zero, not the full-budget value
        "--min_margin", "8",
    ])
    assert rc == 0

    with open(os.path.join(wd, "stream_summary.json")) as f:
        full = json.load(f)
    s = full["summary"]
    # the ablation's ceiling is ~50% (two plausible events per crop, query
    # generic); memory must beat it and clear 50% absolute
    assert s["stream_gt_mean_pool"] >= s["ablation"] + 8.0, full
    assert s["stream_gt_mean_pool"] >= 50.0, full
