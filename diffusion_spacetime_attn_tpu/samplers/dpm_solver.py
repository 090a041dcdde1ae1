"""DPM-Solver++ (1M / 2M multistep, data prediction) as a `lax.scan`.

Covers the reference's DPM-Solver surface
(`ldm/models/diffusion/dpm_solver/sampler.py`, `dpm_solver.py` — stock,
and in fact *incompatible* with the reference's modified model signature;
here it shares the same eps_fn interface as every other sampler, so it works
with and without spatial control).

Order 1 is algebraically identical to DDIM(eta=0) — kept as a property test.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.schedule import DiffusionSchedule


def dpm_solver_sample(
    eps_fn: Callable,
    x_T: jnp.ndarray,
    sched: DiffusionSchedule,
    order: int = 2,
    remat: bool = True,
    lower_order_final: bool = True,
) -> jnp.ndarray:
    """lower_order_final=True matches the reference's single call site
    (`dpm_solver/sampler.py:80`): when the total step count is < 15
    (`dpm_solver.py:1094`), the final update drops to order 1
    (`step_order = min(order, steps + 1 - step)`) — stabilizes the last
    large-h multistep extrapolation at few-step operating points."""
    if order not in (1, 2):
        raise ValueError("order must be 1 or 2")
    from .remat import maybe_remat

    eps_fn = maybe_remat(eps_fn, remat)

    S = sched.num_steps
    # alpha/sigma/lambda at the current state (loop order) and at the target
    a_cur = jnp.sqrt(sched.alphas)
    s_cur = jnp.sqrt(1.0 - sched.alphas)
    a_tgt = jnp.sqrt(sched.alphas_prev)
    s_tgt = jnp.sqrt(1.0 - sched.alphas_prev)
    lam_cur = jnp.log(a_cur / s_cur)
    lam_tgt = jnp.log(a_tgt / s_tgt)
    h = lam_tgt - lam_cur  # > 0 while denoising

    def x0_pred(x, i):
        e = eps_fn(x, sched.timesteps[i], i)
        return (x - s_cur[i] * e) / a_cur[i]

    def first_order(x, x0, i):
        return (s_tgt[i] / s_cur[i]) * x - a_tgt[i] * (jnp.exp(-h[i]) - 1.0) * x0

    # step 0 is always first order
    x0_0 = x0_pred(x_T, 0)
    x = first_order(x_T, x0_0, 0)

    # reference `dpm_solver.py:1094`: the order drop only engages below 15
    # total steps (S here counts solver updates, = the reference's `steps`)
    drop_final = lower_order_final and S < 15

    def body(carry, i):
        x, x0_prev = carry
        x0 = x0_pred(x, i)
        if order == 1:
            x_new = first_order(x, x0, i)
        else:
            r = h[i - 1] / h[i]
            d = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev
            if drop_final:
                # step_order = min(order, steps + 1 - step) → order 1 on the
                # final update only (order 2 everywhere else)
                d = jnp.where(i == S - 1, x0, d)
            x_new = first_order(x, d, i)
        return (x_new, x0), None

    (x, _), _ = lax.scan(body, (x, x0_0), jnp.arange(1, S))
    return x
