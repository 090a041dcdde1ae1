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
    mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    start_step: int = 0,
) -> jnp.ndarray:
    """mask/x0: inpainting — keep q_sample(x0, t) where mask==1 (reference
    `plms.py:232-235`).  start_step: skip the first noisy steps (img2img:
    caller provides a partially-noised x_T for timestep[start_step])."""
    from .remat import maybe_remat

    eps_fn = maybe_remat(eps_fn, remat)
    S = sched.num_steps
    stochastic = rng is not None
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, 2 * S).reshape(2, S, -1)
    inpaint = mask is not None
    if inpaint and x0 is None:
        raise ValueError("x0 required with mask")

    def body(x, i):
        if inpaint:
            from ..ops.schedule import q_sample

            noise = jax.random.normal(rngs[1, i], x.shape, x.dtype)
            t = jnp.broadcast_to(sched.timesteps[i], (x.shape[0],))
            x = q_sample(sched, x0, t, noise) * mask + (1.0 - mask) * x
        e = eps_fn(x, sched.timesteps[i], i)
        a_t = sched.alphas[i]
        a_prev = sched.alphas_prev[i]
        sigma = sched.sigmas[i]
        pred_x0 = (x - sched.sqrt_one_minus_alphas[i] * e) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(1.0 - a_prev - sigma ** 2) * e
        x_new = jnp.sqrt(a_prev) * pred_x0 + dir_xt
        if stochastic:
            x_new = x_new + sigma * jax.random.normal(rngs[0, i], x.shape, x.dtype)
        return x_new, None

    x, _ = lax.scan(body, x_T, jnp.arange(start_step, S))
    return x
