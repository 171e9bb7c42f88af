"""Golden tests for window slicing / subsampling / timestamp token conversion.

Golden values are computed from the reference formulas
(eval_nlq_negative.py:224-235, eval_nlq_retrieval_e2e2.py:262-277,
dataset.py:806-811) by hand — not by importing the reference.
"""

import math

import numpy as np
import pytest

from revisionllm_tpu.ops import windows as W


class TestDenseWindows:
    def test_num_windows_mad_3h(self):
        # 3-hour movie at 5 fps: ctx_l = 54000 frames; clip = 125*5 = 625
        ctx_l, clip = 54000, 625
        assert W.num_windows_dense(ctx_l, clip) == math.ceil(54000 / 312) - 1 == 173

    def test_bounds_overlap_50pct(self):
        bounds = W.dense_window_bounds(2000, 625)
        assert bounds[0] == (0, 625)
        assert bounds[1] == (312, 937)
        # tail clamps end to ctx_l-1 without back-shifting start
        assert bounds[-1][1] == 1999 or bounds[-1][1] == bounds[-1][0] + 625

    def test_small_track(self):
        bounds = W.dense_window_bounds(700, 625)
        # ceil(700/312)-1 = 2
        assert len(bounds) == 2
        assert bounds[0] == (0, 625)
        assert bounds[1] == (312, 699)  # end clamped to ctx_l-1


class TestStridedWindows:
    def test_stride5_backshift(self):
        ctx_l, clip = 2000, 625
        bounds = W.strided_window_bounds(ctx_l, clip, 5)
        # step = 625 // 5 = 125
        assert W.num_windows_strided(ctx_l, clip, 5) == math.ceil(2000 / 125) - 1 == 15
        assert bounds[0] == (0, 625)
        assert bounds[1] == (125, 750)
        # tail windows stay full length via back-shift
        for s, e in bounds:
            assert e - s == clip

    def test_all_windows_inside_track(self):
        bounds = W.strided_window_bounds(3001, 625, 5)
        for s, e in bounds:
            assert 0 <= s <= e <= 3000


class TestLinspace:
    def test_matches_numpy_int_truncation(self):
        idx = W.linspace_indices(312, 937, 250)
        ref = np.linspace(312, 937, 250, dtype=np.int32)
        np.testing.assert_array_equal(idx, ref)

    def test_window_frame_indices_shape(self):
        bounds = [(0, 625), (312, 937)]
        plan = W.window_frame_indices(bounds, 250)
        assert plan.shape == (2, 250)
        assert plan[0, 0] == 0 and plan[0, -1] == 625
        assert plan[1, 0] == 312 and plan[1, -1] == 937

    def test_gather_windows_device(self):
        import jax.numpy as jnp

        feats = jnp.arange(1000, dtype=jnp.float32)[:, None] * jnp.ones((1, 4))
        plan = W.window_frame_indices([(0, 9), (10, 19)], 5)
        out = W.gather_windows(feats, plan)
        assert out.shape == (2, 5, 4)
        np.testing.assert_allclose(np.asarray(out)[0, :, 0], [0, 2, 4, 6, 9])


class TestGroundTruthWindows:
    def test_reference_formula(self):
        # start=100s, end=200s, duration=3600s; clip_len=0.2 -> 500..1000 units
        ids, dur = W.get_ground_truth_windows(100.0, 200.0, 3600.0)
        assert ids == list(range(math.floor(500 / 450), math.ceil(1000 / 450) + 1))
        assert ids == [1, 2, 3]
        assert dur == math.ceil(18000 / 450) + 1 == 41

    def test_zero_start(self):
        ids, dur = W.get_ground_truth_windows(0.0, 10.0, 100.0)
        assert ids == [0, 1]
        assert dur == math.ceil(500 / 450) + 1 == 3


class TestTimestampToken:
    @pytest.mark.parametrize(
        "duration,x,num_frames,expected",
        [
            (125, 0.0, 250, "00"),
            (125, 62.5, 250, "125"),
            (125, 125.0, 250, "249"),   # clamped to num_frames-1
            (125, 124.9, 250, "249"),
            (100, 50.0, 100, "50"),
            (100, 2.0, 100, "02"),      # zero-padded single digit
            (100, 1.25, 100, "01"),     # round(1.25) = 1
            (100, 2.5, 100, "02"),      # banker's rounding: round(2.5) = 2
            (100, 3.5, 100, "04"),      # round(3.5) = 4
        ],
    )
    def test_golden(self, duration, x, num_frames, expected):
        assert W.timestamp_to_frame_token(duration, x, num_frames) == expected
