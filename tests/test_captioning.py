"""Captioning metric golden tests."""

import pytest

from revisionllm_tpu.eval.captioning import (
    CiderScorer,
    bleu,
    eval_dvc,
    eval_soda,
    rouge_l,
    tiou,
)


class TestBleu:
    def test_exact_match(self):
        assert bleu("the cat sat on the mat", ["the cat sat on the mat"]) == pytest.approx(1.0)

    def test_no_overlap_near_zero(self):
        assert bleu("aaa bbb ccc ddd", ["www xxx yyy zzz"]) < 0.01

    def test_partial(self):
        s = bleu("the cat sat", ["the cat sat on the mat"])
        assert 0.0 < s < 1.0


class TestRouge:
    def test_exact(self):
        assert rouge_l("a b c d", ["a b c d"]) == pytest.approx(1.0)

    def test_subsequence(self):
        assert rouge_l("a c", ["a b c"]) > 0.5

    def test_empty(self):
        assert rouge_l("", ["a b"]) == 0.0


class TestCider:
    def test_identical_scores_high(self):
        cands = {"k1": "a man rides a horse", "k2": "a dog barks loudly"}
        refs = {"k1": ["a man rides a horse"], "k2": ["a dog barks loudly"]}
        mean, per = CiderScorer().compute(cands, refs)
        assert mean > 1.0  # CIDEr scale 0..10
        assert per["k1"] > per.get("k_missing", 0)

    def test_mismatch_low(self):
        cands = {"k1": "completely unrelated words here"}
        refs = {"k1": ["a man rides a horse"]}
        mean, _ = CiderScorer().compute(cands, refs)
        assert mean < 0.5


class TestTiou:
    def test_values(self):
        assert tiou((0, 10), (0, 10)) == pytest.approx(1.0)
        assert tiou((0, 10), (5, 15)) == pytest.approx(5 / 15)
        assert tiou((0, 1), (5, 6)) == 0.0


class TestEvalDvc:
    def test_perfect_predictions(self):
        preds = {"v1": [{"timestamp": [0, 10], "sentence": "a man walks"}]}
        gts = {"v1": [{"timestamp": [0, 10], "sentence": "a man walks"}]}
        m = eval_dvc(preds, gts, tious=(0.5,))
        assert m["Recall"] == pytest.approx(1.0)
        assert m["Precision"] == pytest.approx(1.0)
        assert m["BLEU4"] == pytest.approx(1.0)

    def test_no_temporal_match(self):
        preds = {"v1": [{"timestamp": [50, 60], "sentence": "a man walks"}]}
        gts = {"v1": [{"timestamp": [0, 10], "sentence": "a man walks"}]}
        m = eval_dvc(preds, gts, tious=(0.5,))
        assert m["Recall"] == 0.0 and m["BLEU4"] == 0.0


class TestSoda:
    def test_aligned_story(self):
        preds = {
            "v1": [
                {"timestamp": [0, 10], "sentence": "intro scene"},
                {"timestamp": [10, 20], "sentence": "main action"},
            ]
        }
        gts = {
            "v1": [
                {"timestamp": [0, 10], "sentence": "intro scene"},
                {"timestamp": [10, 20], "sentence": "main action"},
            ]
        }
        m = eval_soda(preds, gts)
        assert m["SODA_c"] == pytest.approx(1.0, abs=1e-6)

    def test_empty_prediction(self):
        m = eval_soda({"v1": []}, {"v1": [{"timestamp": [0, 1], "sentence": "x"}]})
        assert m["SODA_c"] == 0.0


class TestMeteor:
    def test_perfect_match(self):
        from revisionllm_tpu.eval.captioning import meteor

        s = meteor("a dog jumps over the fence", ["a dog jumps over the fence"])
        # all matched, one chunk: Fmean=1, penalty 0.5*(1/6)^3
        assert s == pytest.approx(1.0 - 0.5 * (1 / 6) ** 3)

    def test_stem_stage_matches_morphology(self):
        from revisionllm_tpu.eval.captioning import meteor

        with_stem = meteor("the dogs jumping", ["the dog jumped"])
        assert with_stem > 0.5  # dogs/dog + jumping/jumped match via stems

    def test_fragmentation_penalty(self):
        from revisionllm_tpu.eval.captioning import meteor

        ordered = meteor("a b c d", ["a b c d"])
        scrambled = meteor("d c b a", ["a b c d"])
        assert ordered > scrambled  # same matches, more chunks

    def test_no_overlap_zero(self):
        from revisionllm_tpu.eval.captioning import meteor

        assert meteor("xyz qrs", ["completely different words"]) == 0.0

    def test_eval_dvc_reports_meteor(self):
        from revisionllm_tpu.eval.captioning import eval_dvc

        preds = {"v": [{"timestamp": [0, 10], "sentence": "a dog jumps"}]}
        gts = {"v": [{"timestamp": [0, 10], "sentence": "the dog jumped"}]}
        m = eval_dvc(preds, gts)
        assert "METEOR_approx" in m and m["METEOR_approx"] > 0
