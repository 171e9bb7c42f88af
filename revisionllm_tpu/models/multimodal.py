"""Static-shape multimodal splicing.

The reference splices projected video (and memory) features into the token
embedding sequence with a per-sample Python loop over dynamic chunk sizes
(reference revisionllm/model/vtimellm_arch.py:162-276). That pattern cannot
compile: every sample changes the program. The TPU-native design splits the
work:

- HOST (`build_splice_plan`, NumPy, microseconds): walk the sentinel-carrying
  token ids once and emit a fixed-length *plan* — per-position token id,
  source kind (text / video / memory / pad), source index, label, position id.
- DEVICE (`splice_embeds`, jnp): one embedding lookup + one gather + selects
  assemble the final [B, L, D] embedding matrix. Same token stream the
  reference builds, but with static shapes and zero host round-trips during
  the step.

Labels reproduce the reference semantics: IGNORE(-100) on video/memory/pad
positions (vtimellm_arch.py:207,215,226) and on human-turn tokens (done by the
conversation preprocessing upstream).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from revisionllm_tpu.constants import (
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
    MEMORY_TOKEN_INDEX,
)

KIND_PAD = 0
KIND_TEXT = 1
KIND_VIDEO = 2
KIND_MEMORY = 3


@dataclasses.dataclass
class SplicePlan:
    """Fixed-length assembly plan for one sample (all int32 NumPy)."""

    text_ids: np.ndarray   # [L] token id at text positions, 0 elsewhere
    kind: np.ndarray       # [L] KIND_*
    src_idx: np.ndarray    # [L] index into the video / memory token block
    labels: np.ndarray     # [L] LM labels (-100 outside supervised text)
    positions: np.ndarray  # [L] position ids (0..len-1 then 0s)
    length: int            # valid prefix length

    @property
    def num_video_tokens(self) -> int:
        return int((self.kind == KIND_VIDEO).sum())


def build_splice_plan(
    input_ids: Sequence[int],
    num_video_tokens: int,
    max_len: int,
    labels: Optional[Sequence[int]] = None,
    num_memory_tokens: int = 0,
) -> SplicePlan:
    """Expand sentinel ids into a fixed-length layout.

    Every IMAGE_TOKEN_INDEX expands to `num_video_tokens` video positions;
    a MEMORY_TOKEN_INDEX expands to `num_memory_tokens` memory positions.
    Truncates at max_len (parity: tokenizer_model_max_length truncation,
    reference vtimellm_arch.py:240-244).
    """
    text_ids = np.zeros(max_len, np.int32)
    kind = np.zeros(max_len, np.int32)
    src_idx = np.zeros(max_len, np.int32)
    out_labels = np.full(max_len, IGNORE_INDEX, np.int32)
    pos = 0
    vid_cursor = 0
    mem_cursor = 0
    labels = list(labels) if labels is not None else None

    for i, tok in enumerate(input_ids):
        if pos >= max_len:
            break
        if tok == IMAGE_TOKEN_INDEX:
            n = min(num_video_tokens, max_len - pos)
            kind[pos : pos + n] = KIND_VIDEO
            src_idx[pos : pos + n] = np.arange(vid_cursor, vid_cursor + n)
            vid_cursor += n
            pos += n
        elif tok == MEMORY_TOKEN_INDEX:
            n = min(num_memory_tokens, max_len - pos)
            kind[pos : pos + n] = KIND_MEMORY
            src_idx[pos : pos + n] = np.arange(mem_cursor, mem_cursor + n)
            mem_cursor += n
            pos += n
        else:
            kind[pos] = KIND_TEXT
            text_ids[pos] = tok
            if labels is not None:
                out_labels[pos] = labels[i]
            pos += 1

    positions = np.zeros(max_len, np.int32)
    positions[:pos] = np.arange(pos)
    return SplicePlan(text_ids, kind, src_idx, out_labels, positions, pos)


def stack_plans(plans: List[SplicePlan]) -> Dict[str, np.ndarray]:
    """Batch plans into arrays ready for device transfer."""
    return {
        "text_ids": np.stack([p.text_ids for p in plans]),
        "kind": np.stack([p.kind for p in plans]),
        "src_idx": np.stack([p.src_idx for p in plans]),
        "labels": np.stack([p.labels for p in plans]),
        "positions": np.stack([p.positions for p in plans]),
        "lengths": np.asarray([p.length for p in plans], np.int32),
    }


def splice_embeds(
    text_embeds: jnp.ndarray,
    kind: jnp.ndarray,
    src_idx: jnp.ndarray,
    video_tokens: Optional[jnp.ndarray] = None,
    memory_tokens: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Device-side assembly.

    text_embeds: [B, L, D] (embedding of plan.text_ids); kind/src_idx: [B, L];
    video_tokens: [B, Nv, D] projected adapter outputs; memory_tokens:
    [B, Nm, D]. Returns [B, L, D].
    """
    out = text_embeds
    if video_tokens is not None:
        nv = video_tokens.shape[1]
        idx = jnp.clip(src_idx, 0, nv - 1)
        gathered = jnp.take_along_axis(
            video_tokens, idx[..., None].astype(jnp.int32), axis=1
        )
        out = jnp.where((kind == KIND_VIDEO)[..., None], gathered.astype(out.dtype), out)
    if memory_tokens is not None:
        nm = memory_tokens.shape[1]
        idx = jnp.clip(src_idx, 0, nm - 1)
        gathered = jnp.take_along_axis(
            memory_tokens, idx[..., None].astype(jnp.int32), axis=1
        )
        out = jnp.where((kind == KIND_MEMORY)[..., None], gathered.astype(out.dtype), out)
    return out
