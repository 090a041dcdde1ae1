"""LR schedules (reference `trainer/scheduler.py:86-131` BertScheduler):
linear warmup from 0.1·max_lr → max_lr, hold, linear decay with slope
max_lr/decay_steps, floored at min_lr."""
from __future__ import annotations

import jax.numpy as jnp


def bert_schedule(
    max_lr: float,
    min_lr: float,
    warmup_steps: float,
    hold_steps: float,
    decay_steps: float,
):
    warmup_steps = float(warmup_steps)
    hold_steps = float(hold_steps)
    decay_steps = max(float(decay_steps), 1.0)

    def schedule(step):
        # the reference increments its counter before reading it
        t = step.astype(jnp.float32) + 1.0 if hasattr(step, "astype") else float(step) + 1.0
        warm = 0.1 * max_lr + (0.9 * max_lr / max(warmup_steps, 1.0)) * t
        decay = max_lr - (t - (warmup_steps + hold_steps)) * (max_lr / decay_steps)
        lr = jnp.where(
            t < warmup_steps,
            warm,
            jnp.where(t < warmup_steps + hold_steps, max_lr, decay),
        )
        return jnp.maximum(lr, min_lr)

    return schedule
