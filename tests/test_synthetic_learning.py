"""The system LEARNS to ground events (VERDICT r3 item 1).

Runs scripts/synthetic_learning_demo.py end-to-end at reduced step counts:
synthetic corpus -> stage-1 training through train_cli (real stage machine,
collator, exporter) -> stage-2 hierarchical retrieval training
(training_stage=3 over the stage-1 LoRA) -> eval/stage1.py ->
grounding-prefiltered eval/stage2.py -> eval/fusion.py — and asserts
held-out R@1 FAR above chance.

Chance level: a random span in a 540 s movie against a ~36 s GT scores
R1@0.5 of ~3-5%; the bars below are an order of magnitude above that while
leaving margin for seed-to-seed training noise (full-budget numbers live in
LEARNING.md).
"""

import json
import os
import sys

import pytest

pytest.importorskip("transformers")
pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.mark.slow
def test_learns_to_ground(tmp_path):
    import synthetic_learning_demo

    wd = str(tmp_path / "demo")
    rc = synthetic_learning_demo.main([
        "--work_dir", wd,
        "--steps1", "1800",
        "--steps_sparse", "1200",
        "--steps2", "1500",
        "--min_r1_at_05", "15",
    ])
    assert rc == 0

    with open(os.path.join(wd, "learning_summary.json")) as f:
        full = json.load(f)
    s = full["summary"]
    # stage-1 dense grounding on held-out movies: far above the ~3-5% chance
    assert s["stage1_R1@0.3"] >= 35.0, s
    assert s["stage1_R1@0.5"] >= 15.0, s
    # the fused recursive pipeline still grounds well above chance
    assert s["fused_R1@0.3"] >= 20.0, s
    assert s["fused_R1@0.5"] >= 15.0, s


@pytest.mark.slow
def test_quant_serving_accuracy(tmp_path):
    """The int8+W8A8+KV8 serving default stays within the small-eval noise
    band of bf16 on a TRAINED model (VERDICT r4 #3). Bars are loose (n=32,
    1sigma ~ 9 pts; the tiny model's 128-wide dots carry ~5.7x the relative
    quant noise of 7B) — this guards against the default path BREAKING, not
    against noise."""
    import quant_accuracy_ab
    import synthetic_learning_demo

    wd = str(tmp_path / "demo")
    rc = synthetic_learning_demo.main([
        "--work_dir", wd,
        "--steps1", "1800", "--steps_sparse", "1", "--steps2", "1",
        "--min_r1_at_05", "-1",  # only stage-1 matters for this guard
    ])
    assert rc == 0
    rc = quant_accuracy_ab.main([
        "--demo_dir", wd, "--configs", "bf16,int8_w8a8_kv8",
    ])
    assert rc == 0
    with open(os.path.join(wd, "quant_ab", "quant_ab.json")) as f:
        t = json.load(f)
    assert t["bf16"]["R1@0.5"] >= 15.0, t  # the model grounds at all
    assert t["int8_w8a8_kv8"]["R1@0.5"] >= t["bf16"]["R1@0.5"] - 20.0, t
