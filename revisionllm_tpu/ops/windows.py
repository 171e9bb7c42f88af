"""Window slicing and frame subsampling over long feature tracks.

These are the algorithmic long-context levers of ReVisionLLM (SURVEY.md §5.7):
an hour-long video never enters one attention window — it is cut into
overlapping windows, each linspace-resampled to a fixed frame count.

Host (NumPy) variants produce index plans once per video; device (jnp)
variants gather on-TPU so the whole window batch is built inside the compiled
program instead of a Python loop.

Parity targets:
- stage-1 dense slicing: reference revisionllm/eval/eval_nlq_negative.py:224-235
  (50% overlap, end clamped to ctx_l-1, no start back-shift)
- stage-2 retrieval slicing: reference
  revisionllm/eval/eval_nlq_retrieval_e2e2.py:262-277 (stride divisor,
  back-shifted start so every window is full length)
- linspace subsampling: np.linspace(start, end, num_frames).astype(int32)
  (reference revisionllm/train/dataset.py:795-797)
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


def linspace_indices(start: int, end: int, num: int) -> np.ndarray:
    """Integer linspace identical to np.linspace(..., dtype=int32) truncation."""
    return np.linspace(start, end, num, dtype=np.int32)


def num_windows_dense(ctx_l: int, clip_length: int) -> int:
    """Number of 50%-overlap windows (reference eval_nlq_negative.py:227)."""
    return math.ceil(ctx_l / (clip_length // 2)) - 1


def dense_window_bounds(ctx_l: int, clip_length: int) -> List[Tuple[int, int]]:
    """(start, end) for each stage-1 dense window.

    start = i * clip_length//2 ; end = min(start + clip_length, ctx_l - 1)
    (reference eval_nlq_negative.py:230-233).
    """
    n = num_windows_dense(ctx_l, clip_length)
    bounds = []
    for i in range(n):
        start = max(i * (clip_length // 2), 0)
        end = min(i * (clip_length // 2) + clip_length, ctx_l - 1)
        bounds.append((start, end))
    return bounds


def num_windows_strided(ctx_l: int, clip_length: int, stride: int) -> int:
    """Number of stride-overlap windows (reference eval_nlq_retrieval_e2e2.py:265)."""
    return math.ceil(ctx_l / (clip_length // stride)) - 1


def strided_window_bounds(ctx_l: int, clip_length: int, stride: int) -> List[Tuple[int, int]]:
    """(start, end) per stage-2 window with full-length back-shift.

    start = i*clip_length//stride; end = min(start+clip_length, ctx_l-1);
    if the tail window is short, shift start back so it is full length
    (reference eval_nlq_retrieval_e2e2.py:269-274).
    """
    n = num_windows_strided(ctx_l, clip_length, stride)
    bounds = []
    for i in range(n):
        start = max(i * (clip_length // stride), 0)
        end = min(i * (clip_length // stride) + clip_length, ctx_l - 1)
        if end - start < clip_length:
            start = end - clip_length
        bounds.append((start, end))
    return bounds


def window_frame_indices(
    bounds: List[Tuple[int, int]], num_frames: int
) -> np.ndarray:
    """[num_windows, num_frames] int32 gather plan: linspace inside each window."""
    if not bounds:
        return np.zeros((0, num_frames), dtype=np.int32)
    return np.stack([linspace_indices(s, e, num_frames) for s, e in bounds], axis=0)


def gather_windows(features: jnp.ndarray, frame_indices) -> jnp.ndarray:
    """Device-side window assembly: one gather builds the full window batch.

    features: [ctx_l, d]; frame_indices: [num_windows, num_frames] (int32).
    Returns [num_windows, num_frames, d]. Replaces the per-window Python loop
    + host stacking of the reference (eval_nlq_negative.py:229-242) with a
    single XLA gather feeding HBM directly.
    """
    idx = jnp.asarray(frame_indices, dtype=jnp.int32)
    return jnp.take(features, idx, axis=0)


def get_ground_truth_windows(
    start: float, end: float, duration: float
) -> Tuple[List[int], int]:
    """GT seconds -> coarse retrieval window-id list + window count.

    clip_len 0.2 s and slide window 450 units are pinned constants of the MAD
    retrieval grid (reference eval_nlq_retrieval_e2e2.py:161-170).
    """
    clip_len = 0.2
    start = start / clip_len
    end = end / clip_len
    slide_window_size = int(900 / 2)
    matched = list(
        range(math.floor(start / slide_window_size), math.ceil(end / slide_window_size) + 1)
    )
    duration = duration / clip_len
    duration = math.ceil(duration / slide_window_size) + 1
    return matched, duration


def timestamp_to_frame_token(duration: float, x: float, num_frames: int) -> str:
    """Timestamp (seconds within window) -> two-digit frame-index token string.

    Uses Python round() (banker's rounding) then clamps to num_frames-1 and
    left-pads to width 2 — exact parity with `convert`
    (reference revisionllm/train/dataset.py:806-811).
    """
    x = x / duration * num_frames
    s = str(min(round(x), num_frames - 1))
    if len(s) == 1:
        s = "0" + s
    return s
