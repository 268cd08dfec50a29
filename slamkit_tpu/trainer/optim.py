"""Optimizer + LR schedules matching the reference's HF TrainingArguments
surface (reference config/training_args/default.yaml:3-15, cli/train.py:48-54):
adamw, max_grad_norm clipping, warmup = max(warmup_steps, warmup_ratio·total),
and scheduler types {linear, cosine, cosine_with_min_lr, constant,
constant_with_warmup}."""
from __future__ import annotations

import math
from typing import Optional

import optax


def resolve_warmup_steps(warmup_steps: int, warmup_ratio: float,
                         total_steps: int) -> int:
    """The reference takes the max of the explicit step count and the ratio
    (reference cli/train.py:48-54)."""
    return max(int(warmup_steps or 0), math.ceil((warmup_ratio or 0.0) * total_steps))


def make_schedule(lr_scheduler_type: str, learning_rate: float, total_steps: int,
                  warmup_steps: int = 0, min_lr: Optional[float] = None):
    """HF-style schedule as an optax schedule fn of the global step."""
    warmup_steps = min(warmup_steps, total_steps)
    decay_steps = max(total_steps - warmup_steps, 1)
    if lr_scheduler_type == "constant":
        return lambda step: learning_rate
    if lr_scheduler_type == "constant_with_warmup":
        warm = optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1))
        return optax.join_schedules([warm, lambda s: learning_rate], [warmup_steps])
    if lr_scheduler_type == "linear":
        warm = optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1))
        decay = optax.linear_schedule(learning_rate, 0.0, decay_steps)
        return optax.join_schedules([warm, decay], [warmup_steps])
    if lr_scheduler_type in ("cosine", "cosine_with_min_lr"):
        end = float(min_lr or 0.0) if lr_scheduler_type == "cosine_with_min_lr" else 0.0
        warm = optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1))
        # cosine from learning_rate down to end over decay_steps
        alpha = end / learning_rate if learning_rate else 0.0
        decay = optax.cosine_decay_schedule(learning_rate, decay_steps, alpha=alpha)
        return optax.join_schedules([warm, decay], [warmup_steps])
    raise ValueError(f"Unknown lr_scheduler_type: {lr_scheduler_type}")


def make_optimizer(args, total_steps: int):
    """AdamW + global-norm clip, driven by the training_args config node.
    Returns (optax transform, schedule fn) — the schedule is also returned so
    the trainer can log lr without peeking into opt state."""
    warmup = resolve_warmup_steps(args.get("warmup_steps", 0),
                                  args.get("warmup_ratio", 0.0), total_steps)
    kwargs = args.get("lr_scheduler_kwargs", None)
    min_lr = None
    if kwargs is not None:
        get = kwargs.get if hasattr(kwargs, "get") else dict(kwargs).get
        min_lr = get("min_lr", None)
    schedule = make_schedule(args.get("lr_scheduler_type", "linear"),
                             float(args.learning_rate), total_steps,
                             warmup_steps=warmup, min_lr=min_lr)
    tx = optax.chain(
        optax.clip_by_global_norm(float(args.get("max_grad_norm", 1.0))),
        optax.adamw(schedule,
                    b1=float(args.get("adam_beta1", 0.9)),
                    b2=float(args.get("adam_beta2", 0.999)),
                    eps=float(args.get("adam_epsilon", 1e-8)),
                    weight_decay=float(args.get("weight_decay", 0.0))),
    )
    return tx, schedule
