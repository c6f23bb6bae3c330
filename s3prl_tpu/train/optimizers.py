"""Optimizers + LR schedules (optax).

Behavioral spec from the reference's s3prl/optimizers.py:19 (TorchOptim
wrapping Adam/AdamW at fixed lr) and s3prl/schedulers.py:12 (linear
warmup-decay). The returned transform also folds in the reference runner's
training hygiene (runner.py:313-354): gradient accumulation (optax
MultiSteps averaging micro-grads), global-norm clipping, and the
NaN/Inf-grad skip guard (apply_if_finite).
"""

from __future__ import annotations

from typing import Optional

import optax


def build_scheduler(
    name: Optional[str],
    lr: float,
    total_steps: int,
    warmup_proportion: float = 0.07,
):
    """None -> constant lr; 'linear_schedule' mirrors schedulers.py:12."""
    if not name:
        return lr
    if name == "linear_schedule":
        warmup = max(int(total_steps * warmup_proportion), 1)
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, lr, warmup),
                optax.linear_schedule(lr, 0.0, max(total_steps - warmup, 1)),
            ],
            [warmup],
        )
    raise ValueError(f"unknown scheduler {name}")


def build_optimizer(
    name: str = "Adam",
    lr: float = 1.0e-4,
    total_steps: int = 200000,
    scheduler: Optional[str] = None,
    warmup_proportion: float = 0.07,
    weight_decay: float = 0.01,
    gradient_clipping: float = 1.0,
    gradient_accumulate: int = 1,
    eps: float = 1.0e-8,
) -> optax.GradientTransformation:
    schedule = build_scheduler(scheduler, lr, total_steps, warmup_proportion)
    if name in ("Adam", "adam"):
        core = optax.adam(schedule, eps=eps)
    elif name in ("AdamW", "adamw"):
        core = optax.adamw(schedule, eps=eps, weight_decay=weight_decay)
    elif name in ("sgd", "SGD"):
        core = optax.sgd(schedule)
    else:
        raise ValueError(f"unknown optimizer {name}")

    chain = optax.chain(optax.clip_by_global_norm(gradient_clipping), core)
    guarded = optax.apply_if_finite(chain, max_consecutive_errors=100)
    if gradient_accumulate > 1:
        return optax.MultiSteps(guarded, every_k_schedule=gradient_accumulate)
    return guarded
