"""Checkpoint save/load + reference artifact export.

Replaces the reference's DeepSpeed ZeRO-3 checkpoint machinery (gathered
state dicts, `zero_to_fp32.py` repair — reference train/train.py:109-126,
scripts/mad/stage1_dense.sh:22-31) with orbax: sharded pytrees save/restore
natively, so there is no gather step and no repair script.

Artifact parity: `export_reference_artifacts` writes the same layout the
reference produces (train/train.py:402-412) — a LoRA adapter dir
(adapter_model.bin + adapter_config.json) + non_lora_trainables.bin — so
checkpoints trained here load in the reference code and vice versa
(models/convert.py is the import direction).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from revisionllm_tpu.config import LoraConfig


_PENDING_SAVES: list = []
_SAVE_ERRORS: list = []
_COPY_FN: Optional[Any] = None


def _device_snapshot(state):
    """Copy every device array in `state` to FRESH device buffers (one jitted
    identity-copy program over the whole tree; an HBM->HBM copy costs ~ms).
    The caller may then donate the originals to the next train step while a
    background thread drains the snapshot to host."""
    global _COPY_FN
    import jax.numpy as jnp

    if _COPY_FN is None:
        _COPY_FN = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
    flat, treedef = jax.tree.flatten(state)
    copied = iter(_COPY_FN([x for x in flat if isinstance(x, jax.Array)]))
    out = [next(copied) if isinstance(x, jax.Array) else x for x in flat]
    return jax.tree.unflatten(treedef, out)


def save_checkpoint(
    path: str, state: Dict[str, Any], step: int, block: bool = True
) -> None:
    """Orbax save of {trainable, opt_state, step}. Resumable mid-run (the
    auto-resume behavior of reference train/train.py:394-397).

    block=False overlaps the WHOLE save with subsequent train steps. Orbax's
    AsyncCheckpointer only backgrounds the disk write; its device->host copy
    is synchronous, and on the relay-tunneled link that copy IS the stall
    (measured ~70 s for a 1.8 GB QLoRA state at ~26 MB/s — TRAIN_7B.json
    round-5 run 1, std 9.0 s from exactly two such stalls). Here the state
    is snapshotted to fresh DEVICE buffers first (~ms; donation-safe
    immediately), then a background thread drains it host-side and commits
    via the blocking orbax writer (atomic rename, so `latest_checkpoint`
    never sees a partial save). Callers MUST call `wait_for_checkpoints()`
    before process exit (and before restoring a just-saved step
    in-process)."""
    import threading

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt_dir = os.path.join(path, f"checkpoint-{step}")
    if not block:
        # Bound live snapshots to ONE: join any still-draining save before
        # allocating the next snapshot. Two 1.8 GB QLoRA snapshots coexisting
        # in HBM OOMed a 7B run (round-5 witness, saves 50 steps apart with a
        # ~70 s drain). Saves spaced further apart than the drain time stall
        # zero; closer spacing stalls for the drain remainder, never OOMs.
        while _PENDING_SAVES:
            _PENDING_SAVES.pop().join()
        snap = _device_snapshot(state)

        def _bg():
            try:
                host = jax.tree.map(
                    lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
                    snap,
                )
                with ocp.StandardCheckpointer() as ckptr:
                    ckptr.save(ckpt_dir, host)
            except Exception as e:  # surfaced by wait_for_checkpoints
                _SAVE_ERRORS.append((ckpt_dir, e))

        t = threading.Thread(target=_bg, daemon=True, name=f"ckpt-save-{step}")
        t.start()
        _PENDING_SAVES.append(t)
        return
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, state)


def wait_for_checkpoints() -> None:
    """Block until every pending async save has committed; re-raise the
    first background-save failure (a silently dropped checkpoint would
    defeat auto-resume)."""
    while _PENDING_SAVES:
        _PENDING_SAVES.pop().join()
    if _SAVE_ERRORS:
        ckpt_dir, err = _SAVE_ERRORS.pop(0)
        _SAVE_ERRORS.clear()
        raise RuntimeError(f"async checkpoint save failed for {ckpt_dir}") from err


def latest_checkpoint(path: str) -> Optional[str]:
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("checkpoint-"):
            try:
                steps.append(int(name.split("-", 1)[1]))
            except ValueError:
                pass
    if not steps:
        return None
    return os.path.join(path, f"checkpoint-{max(steps)}")


def restore_checkpoint(ckpt_dir: str, template: Dict[str, Any]) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(ckpt_dir), template)


# ---------------------------------------------------------------------------
# Reference-format export
# ---------------------------------------------------------------------------

_PEFT_NAME = "base_model.model.model.layers.{i}.self_attn.{name}.lora_{ab}.weight"
_PEFT_MLP_NAME = "base_model.model.model.layers.{i}.mlp.{name}.lora_{ab}.weight"


def export_reference_artifacts(
    out_dir: str,
    lora: Optional[Dict[str, Any]],
    lora_cfg: Optional[LoraConfig],
    vision: Optional[Dict[str, Any]] = None,
) -> None:
    """Write adapter_model.bin + adapter_config.json + non_lora_trainables.bin
    in the reference's on-disk format."""
    import torch

    os.makedirs(out_dir, exist_ok=True)
    if lora is not None and lora_cfg is not None:
        state = {}
        attn = {"q_proj", "k_proj", "v_proj", "o_proj"}
        for name, mats in lora["layers"].items():
            a = np.asarray(mats["a"])  # [L, in, r]
            b = np.asarray(mats["b"])  # [L, r, out]
            tmpl = _PEFT_NAME if name in attn else _PEFT_MLP_NAME
            for i in range(a.shape[0]):
                state[tmpl.format(i=i, name=name, ab="A")] = torch.from_numpy(
                    np.ascontiguousarray(a[i].T)
                )
                state[tmpl.format(i=i, name=name, ab="B")] = torch.from_numpy(
                    np.ascontiguousarray(b[i].T)
                )
        torch.save(state, os.path.join(out_dir, "adapter_model.bin"))
        with open(os.path.join(out_dir, "adapter_config.json"), "w") as f:
            json.dump(
                {
                    "peft_type": "LORA",
                    "r": lora_cfg.r,
                    "lora_alpha": lora_cfg.alpha,
                    "lora_dropout": lora_cfg.dropout,
                    "target_modules": list(lora_cfg.target_patterns),
                    "bias": "none",
                    "task_type": "CAUSAL_LM",
                },
                f,
            )

    if vision is not None:
        state = {}
        _export_vision(state, vision["mm_projector"], "model.mm_projector")
        torch.save(state, os.path.join(out_dir, "non_lora_trainables.bin"))


def _export_vision(state: dict, tree: Dict[str, Any], prefix: str) -> None:
    """Our adapter tree -> reference ClipEncoder state-dict names."""
    import torch

    def t(x):
        x = np.asarray(x)
        if x.dtype.kind not in "fiub":  # ml_dtypes.bfloat16 etc.: no torch
            import torch as _torch      # from_numpy path — go via float32

            return _torch.from_numpy(
                np.ascontiguousarray(x.astype(np.float32))
            ).to(_torch.bfloat16)
        # .copy(): jax buffers arrive read-only; torch wants writable memory
        return torch.from_numpy(np.ascontiguousarray(x).copy())

    if "w" in tree and "b" in tree and len(tree) == 2:  # plain mlp projector
        state[f"{prefix}.weight"] = t(np.asarray(tree["w"]).T)
        state[f"{prefix}.bias"] = t(tree["b"])
        return

    state[f"{prefix}.global_rep_token"] = t(tree["global_token"])
    state[f"{prefix}.global_rep_pos"] = t(tree["global_pos"])

    def export_layers(layers, enc_name):
        for i, layer in enumerate(layers):
            lp = f"{prefix}.{enc_name}.layers.{i}"
            wq, wk, wv = (np.asarray(layer[k]["w"]).T for k in ("wq", "wk", "wv"))
            bq, bk, bv = (np.asarray(layer[k]["b"]) for k in ("wq", "wk", "wv"))
            state[f"{lp}.self_attn.in_proj_weight"] = t(np.concatenate([wq, wk, wv], 0))
            state[f"{lp}.self_attn.in_proj_bias"] = t(np.concatenate([bq, bk, bv], 0))
            state[f"{lp}.self_attn.out_proj.weight"] = t(np.asarray(layer["wo"]["w"]).T)
            state[f"{lp}.self_attn.out_proj.bias"] = t(layer["wo"]["b"])
            state[f"{lp}.linear1.weight"] = t(np.asarray(layer["ffn1"]["w"]).T)
            state[f"{lp}.linear1.bias"] = t(layer["ffn1"]["b"])
            state[f"{lp}.linear2.weight"] = t(np.asarray(layer["ffn2"]["w"]).T)
            state[f"{lp}.linear2.bias"] = t(layer["ffn2"]["b"])
            state[f"{lp}.norm1.weight"] = t(layer["norm1_w"])
            state[f"{lp}.norm1.bias"] = t(layer["norm1_b"])
            state[f"{lp}.norm2.weight"] = t(layer["norm2_w"])
            state[f"{lp}.norm2.bias"] = t(layer["norm2_b"])

    export_layers(tree["enc_layers"], "encoder")
    if "t2v_layers" in tree:
        export_layers(tree["t2v_layers"], "t2v_encoder")
    if "mm_projector" in tree:
        state[f"{prefix}.mm_projector.weight"] = t(np.asarray(tree["mm_projector"]["w"]).T)
        state[f"{prefix}.mm_projector.bias"] = t(tree["mm_projector"]["b"])
    if "text_proj" in tree:
        state[f"{prefix}.text_mm_projector.weight"] = t(np.asarray(tree["text_proj"]["w"]).T)
        state[f"{prefix}.text_mm_projector.bias"] = t(tree["text_proj"]["b"])
