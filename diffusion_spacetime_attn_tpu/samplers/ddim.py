"""DDIM sampler as a `lax.scan` (reference `ldm/models/diffusion/ddim.py`,
stock CompVis).  eta=0 is deterministic; eta>0 adds the DDIM stochastic term
with the provided rng."""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.schedule import DiffusionSchedule


def ddim_sample(
    eps_fn: Callable,
    x_T: jnp.ndarray,
    sched: DiffusionSchedule,
    rng: Optional[jax.Array] = None,
    remat: bool = True,
) -> jnp.ndarray:
    if remat:
        eps_fn = jax.checkpoint(eps_fn)
    S = sched.num_steps
    stochastic = rng is not None
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, S)

    def body(x, i):
        e = eps_fn(x, sched.timesteps[i], i)
        a_t = sched.alphas[i]
        a_prev = sched.alphas_prev[i]
        sigma = sched.sigmas[i]
        pred_x0 = (x - sched.sqrt_one_minus_alphas[i] * e) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(1.0 - a_prev - sigma ** 2) * e
        x_new = jnp.sqrt(a_prev) * pred_x0 + dir_xt
        if stochastic:
            x_new = x_new + sigma * jax.random.normal(rngs[i], x.shape, x.dtype)
        return x_new, None

    x, _ = lax.scan(body, x_T, jnp.arange(S))
    return x
