"""Ancestral DDPM sampler (full train-schedule chain) as a `lax.scan`.

Reference: `ldm/models/diffusion/ddpm.py:219-262` — `q_posterior`,
`p_mean_variance`, `p_sample`, `p_sample_loop` (with the posterior
registration at `ddpm.py:140-157`).  This is what the reference's
`scripts/sample_diffusion.py` "vanilla" mode runs (`convsample` →
`model.p_sample_loop`); the DDIM mode maps to `samplers/ddim.py`.

x_{t-1} = coef1(t)·x0_pred + coef2(t)·x_t + 1[t>0]·exp(½ logvar(t))·ε
with x0_pred = (x_t − sqrt(1−ᾱ_t)·eps)/sqrt(ᾱ_t), optionally clipped to
[−1,1] (`clip_denoised`, reference default True for pixel-space DDPM,
False for latent models).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import ScheduleConfig
from ..ops.schedule import make_beta_schedule


def ddpm_sample(
    eps_fn: Callable,
    x_T: jnp.ndarray,
    schedule_cfg: ScheduleConfig,
    rng: jax.Array,
    clip_denoised: bool = False,
    v_posterior: float = 0.0,
    remat: bool = True,
) -> jnp.ndarray:
    """Full T-step ancestral sampling.  eps_fn(x, t, i) -> eps (the shared
    sampler interface; i is the loop position, t the DDPM timestep)."""
    from .remat import maybe_remat

    eps_fn = maybe_remat(eps_fn, remat)

    betas = make_beta_schedule(schedule_cfg)
    T = betas.shape[0]
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.append(1.0, ac[:-1])
    posterior_variance = (
        (1.0 - v_posterior) * betas * (1.0 - ac_prev) / (1.0 - ac)
        + v_posterior * betas
    )
    # loop order: t = T-1 ... 0 (reference iterates reversed(range(T)))
    order = np.arange(T)[::-1]
    f32 = lambda x: jnp.asarray(x[order], jnp.float32)
    ts = jnp.asarray(order, jnp.int32)
    sqrt_recip_ac = f32(np.sqrt(1.0 / ac))
    sqrt_recipm1_ac = f32(np.sqrt(1.0 / ac - 1.0))
    coef1 = f32(betas * np.sqrt(ac_prev) / (1.0 - ac))
    coef2 = f32((1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac))
    log_var = f32(np.log(np.maximum(posterior_variance, 1e-20)))

    rngs = jax.random.split(rng, T)

    def body(x, i):
        t = ts[i]
        e = eps_fn(x, t, i)
        # predict_start_from_noise (ddpm.py:214-217)
        x0 = sqrt_recip_ac[i] * x - sqrt_recipm1_ac[i] * e
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean = coef1[i] * x0 + coef2[i] * x
        noise = jax.random.normal(rngs[i], x.shape, x.dtype)
        nonzero = (t > 0).astype(x.dtype)
        x_new = mean + nonzero * jnp.exp(0.5 * log_var[i]) * noise
        return x_new, None

    x, _ = lax.scan(body, x_T, jnp.arange(T))
    return x
