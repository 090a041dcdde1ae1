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


def warmup_cosine_schedule(warm_up_steps: float, lr_min: float, lr_max: float,
                           lr_start: float, max_decay_steps: float):
    """LambdaWarmUpCosineScheduler (reference `ldm/lr_scheduler.py:4-33`):
    linear warmup lr_start→lr_max, then half-cosine decay to lr_min.  Returns
    a jit-safe multiplier schedule (use with base lr 1.0, like the reference)."""
    import jax.numpy as jnp

    w = max(float(warm_up_steps), 1.0)
    d = max(float(max_decay_steps) - w, 1.0)

    def schedule(step):
        n = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
        warm = (lr_max - lr_start) / w * n + lr_start
        t = jnp.minimum((n - w) / d, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1.0 + jnp.cos(t * jnp.pi))
        return jnp.where(n < w, warm, cos)

    return schedule


def _cycled(warm_up_steps, f_min, f_max, f_start, cycle_lengths, cosine: bool):
    """Shared core of LambdaWarmUpCosineScheduler2 / LambdaLinearScheduler
    (reference `ldm/lr_scheduler.py:36-98`): per-cycle warmup then cosine or
    linear decay; cycle found by cumulative lengths."""
    import numpy as np

    import jax.numpy as jnp

    k = len(cycle_lengths)
    assert len(warm_up_steps) == len(f_min) == len(f_max) == len(f_start) == k
    cum = np.cumsum([0] + list(cycle_lengths))

    def schedule(step):
        n0 = step.astype(jnp.float32) if hasattr(step, "astype") else jnp.float32(step)
        out = jnp.zeros_like(n0, dtype=jnp.float32)
        done = jnp.zeros_like(n0, dtype=bool)
        for c in range(k):
            inside = n0 <= cum[c + 1] if c < k - 1 else jnp.ones_like(n0, bool)
            n = n0 - cum[c]
            w = max(float(warm_up_steps[c]), 1.0)
            warm = (f_max[c] - f_start[c]) / w * n + f_start[c]
            if cosine:
                t = jnp.minimum((n - w) / max(cycle_lengths[c] - w, 1.0), 1.0)
                dec = f_min[c] + 0.5 * (f_max[c] - f_min[c]) * (1.0 + jnp.cos(t * jnp.pi))
            else:
                dec = f_min[c] + (f_max[c] - f_min[c]) * (cycle_lengths[c] - n) / cycle_lengths[c]
            f = jnp.where(n < w, warm, dec)
            out = jnp.where(jnp.logical_and(inside, ~done), f, out)
            done = jnp.logical_or(done, inside)
        return out

    return schedule


def warmup_cosine_schedule2(warm_up_steps, f_min, f_max, f_start, cycle_lengths):
    """LambdaWarmUpCosineScheduler2 (`ldm/lr_scheduler.py:36-78`)."""
    return _cycled(warm_up_steps, f_min, f_max, f_start, cycle_lengths, True)


def lambda_linear_schedule(warm_up_steps, f_min, f_max, f_start, cycle_lengths):
    """LambdaLinearScheduler (`ldm/lr_scheduler.py:81-98`) — the scheduler the
    SD training configs use (e.g. warm_up_steps [10000], f_start [1e-6],
    f_max/f_min [1.0]); linear warmup then linear decay per cycle."""
    return _cycled(warm_up_steps, f_min, f_max, f_start, cycle_lengths, False)
