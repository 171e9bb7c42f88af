"""Golden tests for answer parsing, IoU, and ranked recall metrics."""

import numpy as np
import pytest

from revisionllm_tpu.eval import metrics as M


class TestParsing:
    def test_parse_span(self):
        assert M.parse_span("From 10 to 20.") == (10, 20)
        assert M.parse_span("between 3 and 7") == (3, 7)
        assert M.parse_span("Not Present") is None

    def test_parse_single(self):
        assert M.parse_single("In video 42") == 42
        assert M.parse_single("no digits") is None


class TestStage1IoU:
    def test_global_mapping_and_iou(self):
        # window 0 answer "From 0 to 125": global frames 0..125 of 1000
        # GT = (0.0, 0.125) normalized
        frames, ious, scores = M.stage1_iou(
            ["From 0 to 125."], (0.0, 0.125), 250, 1000, [], False
        )
        assert frames == {0: (0, 125)}
        assert ious == [1.0]

    def test_window_offset(self):
        # window 1 answer maps with offset 1*250//2 = 125
        frames, ious, _ = M.stage1_iou(
            ["Not Present", "From 0 to 125."], (0.125, 0.25), 250, 1000, [], False
        )
        assert frames == {1: (0, 125)}
        assert ious == [1.0]

    def test_degenerate_answers_skipped(self):
        frames, ious, _ = M.stage1_iou(
            ["From 249 to 249.", "garbage"], (0.0, 0.5), 250, 1000, [], False
        )
        assert frames == {} and ious == []

    def test_same_frame_widened(self):
        frames, _, _ = M.stage1_iou(["From 100 to 100."], (0.0, 0.5), 250, 1000, [], False)
        assert frames == {0: (99, 101)}

    def test_scores_filtered(self):
        _, _, kept = M.stage1_iou(
            ["garbage", "From 1 to 2."], (0.0, 0.5), 250, 1000, [0.3, 0.9], False
        )
        assert kept == [0.9]

    def test_iou_rounding(self):
        # iou rounded to 2 decimals (reference eval_nlq_negative.py:109)
        _, ious, _ = M.stage1_iou(["From 0 to 100."], (0.0, 0.15), 250, 1000, [], False)
        inter = min(0.1, 0.15)
        union = max(0.1, 0.15)
        assert ious == [round(inter / union, 2)]


class TestStage2Hit:
    def test_identity_permutation_hit(self):
        frames, hit = M.stage2_window_hit(
            outputs=["In video 3"],
            gt_windows=[3, 4],
            starts=[0],
            indexes=[list(range(10))],
            hierarchy_zooms=[1],
            grounding_windows=list(range(10)),
            num_frames_video=100,
        )
        assert frames == {0: (2, 4)}
        assert hit == [1]

    def test_permutation_unshuffle(self):
        # model said index 0, but permutation maps slot 0 -> original window 7
        perm = [7, 1, 2, 3, 4, 5, 6, 0, 8, 9]
        frames, hit = M.stage2_window_hit(
            ["In video 0"], [7, 8], [0], [perm], [1], list(range(10)), 100
        )
        assert frames == {0: (6, 8)}
        assert hit == [1]

    def test_zoom_division(self):
        # zoom 2: predicted 6 -> 6//2 = 3
        frames, hit = M.stage2_window_hit(
            ["In video 6"], [3, 4], [0], [list(range(10))], [2], list(range(10)), 100
        )
        assert frames == {0: (2, 4)}
        assert hit == [1]

    def test_miss(self):
        _, hit = M.stage2_window_hit(
            ["In video 9"], [0], [0], [list(range(20))], [1], list(range(20)), 100
        )
        assert hit == [0]


class TestStage2ChosenWindows:
    """Parity with the reference's in-loop score_cos selection
    (eval_nlq_retrieval_e2e2.py:360-386), hand-traced golden values."""

    def test_selection_with_zoom_quirk(self):
        # zoom 2 has 2 calls (call_in_zoom 0,1), zoom 1 has 1 call whose
        # quirky lookup resolves against the FIRST zoom's entries (c=0)
        chosen = M.stage2_chosen_windows(
            outputs=["In video 3", "no", "In video 5"],
            starts=[0, 4, 0],
            indexes=[[2, 1, 0, 3], [1, 0, 3, 2], list(range(8))],
            hierarchy_zooms=[2, 2, 1],
            call_in_zoom=[0, 1, 0],
            grounding_windows=list(range(10)),
            num_videos=8,
        )
        # pass 0: 3//2=1 -> indexes[0][1]=1 -> +0 -> gw=1 -> range(0, 2)
        # pass 1: no integer -> None (reference emits literal 0.0)
        # pass 2: c=0 (quirk): 5//2=2 -> indexes[0][2]=0 -> gw=0 -> range(0, 1)
        assert chosen == [[0, 1], None, [0]]

    def test_clamps(self):
        chosen = M.stage2_chosen_windows(
            outputs=["In video 99"],
            starts=[0],
            indexes=[[0, 1]],
            hierarchy_zooms=[1],
            call_in_zoom=[0],
            grounding_windows=[0, 1, 2],
            num_videos=4,
        )
        # 99 >= len(indexes[0]) so no un-permute; clamp to gw index 2 ->
        # gw=2 -> range(1, min(3, 3)) = [1, 2]
        assert chosen == [[1, 2]]

    def test_empty_neighborhood(self):
        # gw beyond num_videos-1 collapses the scored range to empty
        chosen = M.stage2_chosen_windows(
            outputs=["In video 0"],
            starts=[0],
            indexes=[[9]],
            hierarchy_zooms=[1],
            call_in_zoom=[0],
            grounding_windows=list(range(12)),
            num_videos=4,
        )
        # 0 -> indexes[0][0]=9 -> gw=9 -> range(8, min(10, 3)) = []
        assert chosen == [[]]


class TestRankedMetrics:
    def _mk_log(self, ious, scores):
        return {"task": "grounding", "info": {"iou": ious, "scores": scores}}

    def test_perfect_r1(self):
        logs = [self._mk_log([0.9, 0.1], [1.0, 0.5]) for _ in range(4)]
        m = M.grounding_metrics_stream(logs)
        assert m["mIoU"] == pytest.approx(90.0)
        assert m["R1@0.5"] == pytest.approx(100.0)
        assert m["R1@0.9"] == pytest.approx(0.0)  # strict > comparison

    def test_rank_by_score(self):
        # best IoU has lower score => R1 misses, R5 catches
        logs = [self._mk_log([0.2, 0.8], [1.0, 0.5])]
        m = M.grounding_metrics_stream(logs)
        assert m["R1@0.5"] == pytest.approx(0.0)
        assert m["R5@0.5"] == pytest.approx(100.0)
        assert m["mIoU"] == pytest.approx(20.0)

    def test_min_max_normalize(self):
        assert M.min_max_normalize([1.0, 3.0, 2.0]) == [0.0, 1.0, 0.5]
        assert M.min_max_normalize([2.0, 2.0]) == [2.0, 2.0]
        assert M.min_max_normalize([]) == []


class TestFusion:
    def test_fusion_keeps_retrieved_regions(self):
        gl = {
            "query_id": "q1",
            "task": "grounding",
            "answer": ["From 1 to 2.", "Not Present", "From 3 to 4.", "From 5 to 6."],
            "info": {"iou": [0.9, 0.1, 0.2], "scores": [0.5, 0.4, 0.3]},
        }
        # retrieval hit on window 2 -> grounding range [0, .4*(2+1))∩... via 0.4
        rl = {
            "query_id": "q1",
            "info": {"frames": {"0": [0, 3]}, "mean_entropy": [0.5]},
        }
        fused, ratio = M.fuse_retrieval_grounding([gl], [rl])
        assert len(fused) == 1
        assert ratio > 0

    def test_missing_retrieval_query_dropped(self):
        gl = {"query_id": "qX", "task": "grounding", "answer": [], "info": {"iou": [], "scores": []}}
        fused, _ = M.fuse_retrieval_grounding([gl], [])
        assert fused == []


class TestMergeResultsCli:
    def test_merge(self, tmp_path):
        import json

        from revisionllm_tpu.eval import merge_results

        with open(tmp_path / "predictions_streaming_0.txt", "w") as f:
            f.write(json.dumps({"task": "grounding", "query_id": "q1", "video_id": "m",
                                "answer": ["x"], "info": {"iou": [0.6]}}) + "\n")
        m = merge_results.main(["--log_path", str(tmp_path), "--total_split", "1"])
        assert m["mIoU"] == pytest.approx(60.0)
