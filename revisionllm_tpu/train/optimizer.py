"""Optimizer and LR schedule.

AdamW + linear warmup + cosine decay — the HF Trainer configuration every
reference training script pins (scripts/mad/stage1_dense.sh:52-57:
lr 1e-4, warmup_ratio 0.03, lr_scheduler_type cosine, weight_decay 0).
Built on optax; the optimizer state inherits the parameter shardings, which
is all ZeRO needs on TPU.
"""

from __future__ import annotations

import optax

from revisionllm_tpu.config import TrainConfig


def cosine_schedule(cfg: TrainConfig, total_steps: int) -> optax.Schedule:
    warmup = max(int(cfg.warmup_ratio * total_steps), 1)
    if cfg.lr_scheduler == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=warmup,
            decay_steps=max(total_steps, warmup + 1),
            end_value=0.0,
        )
    if cfg.lr_scheduler == "constant":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, cfg.learning_rate, warmup),
                optax.constant_schedule(cfg.learning_rate),
            ],
            [warmup],
        )
    raise ValueError(f"unknown scheduler {cfg.lr_scheduler!r}")


def make_optimizer(cfg: TrainConfig, total_steps: int) -> optax.GradientTransformation:
    schedule = cosine_schedule(cfg, total_steps)
    opt = optax.adamw(
        learning_rate=schedule,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=cfg.weight_decay,
    )
    if cfg.gradient_accumulation > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.gradient_accumulation)
    return opt
