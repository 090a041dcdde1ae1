"""DDPM / DDIM schedule math, replicated from the reference semantics.

Reference: `ldm/modules/diffusionmodules/util.py:21-77` (make_beta_schedule,
make_ddim_timesteps, make_ddim_sampling_parameters) and
`ldm/models/diffusion/plms.py:81-112` (PLMS schedule registration).

All arrays are computed once on host in float64 and materialized as float32
jnp constants; they are closed over by the jitted samplers, so no schedule
math happens inside a trace.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..config import ScheduleConfig


def make_beta_schedule(cfg: ScheduleConfig) -> np.ndarray:
    """CompVis "linear" schedule: linear in sqrt-beta space."""
    if cfg.schedule == "linear":
        betas = (
            np.linspace(
                cfg.linear_start ** 0.5,
                cfg.linear_end ** 0.5,
                cfg.num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
    elif cfg.schedule == "sqrt_linear":
        betas = np.linspace(
            cfg.linear_start, cfg.linear_end, cfg.num_train_timesteps, dtype=np.float64
        )
    else:
        raise ValueError(f"unknown schedule {cfg.schedule!r}")
    return betas


def make_ddim_timesteps(num_steps: int, num_train_timesteps: int) -> np.ndarray:
    """Uniform DDIM step selection, shifted by +1 (CompVis convention).

    For 50 steps over 1000: [1, 21, ..., 981]; the samplers iterate it
    reversed, so the first model timestep is 981.
    """
    c = num_train_timesteps // num_steps
    # take exactly num_steps entries (the reference's open range over-runs
    # and would index out of bounds for non-divisor step counts)
    steps = np.asarray(list(range(0, num_train_timesteps, c)))[:num_steps]
    return steps + 1


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All per-step constants for a fixed (num_steps, eta) sampler run.

    Index convention matches the reference: position ``i`` in the reversed
    iteration (i = 0 is the *noisiest* step, t = 981) reads schedule entry
    ``index = num_steps - 1 - i``.  Here every array is pre-reversed so the
    sampler simply indexes by loop position ``i``.
    """

    num_steps: int
    # [S] in loop order (t descending: 981, 961, ..., 1)
    timesteps: jnp.ndarray
    timesteps_next: jnp.ndarray  # t of the following loop position (clamped)
    alphas: jnp.ndarray          # alpha_cumprod at t
    alphas_prev: jnp.ndarray     # alpha_cumprod at previous (less noisy) step
    sqrt_one_minus_alphas: jnp.ndarray
    sigmas: jnp.ndarray          # DDIM sigma (0 for eta=0 / PLMS)
    # full [T] train-schedule arrays (for q_sample / training losses)
    alphas_cumprod: jnp.ndarray
    betas: jnp.ndarray


def make_schedule(
    cfg: ScheduleConfig, num_steps: int, eta: float = 0.0
) -> DiffusionSchedule:
    betas = make_beta_schedule(cfg)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)

    ddim_ts = make_ddim_timesteps(num_steps, cfg.num_train_timesteps)
    ddim_alphas = alphas_cumprod[ddim_ts]
    ddim_alphas_prev = np.asarray(
        [alphas_cumprod[0]] + alphas_cumprod[ddim_ts[:-1]].tolist()
    )
    ddim_sigmas = eta * np.sqrt(
        (1 - ddim_alphas_prev)
        / (1 - ddim_alphas)
        * (1 - ddim_alphas / ddim_alphas_prev)
    )

    # reorder into loop order (reversed: noisiest first)
    order = np.arange(num_steps)[::-1]
    ts_loop = ddim_ts[order]
    ts_next = np.concatenate([ts_loop[1:], ts_loop[-1:]])

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DiffusionSchedule(
        num_steps=num_steps,
        timesteps=jnp.asarray(ts_loop, dtype=jnp.int32),
        timesteps_next=jnp.asarray(ts_next, dtype=jnp.int32),
        alphas=f32(ddim_alphas[order]),
        alphas_prev=f32(ddim_alphas_prev[order]),
        sqrt_one_minus_alphas=f32(np.sqrt(1.0 - ddim_alphas)[order]),
        sigmas=f32(ddim_sigmas[order]),
        alphas_cumprod=f32(alphas_cumprod),
        betas=f32(betas),
    )


def q_sample(schedule: DiffusionSchedule, x0, t, noise):
    """Forward diffusion q(x_t | x_0) (reference `ddpm.py` q_sample)."""
    sqrt_ac = jnp.sqrt(schedule.alphas_cumprod)[t]
    sqrt_om = jnp.sqrt(1.0 - schedule.alphas_cumprod)[t]
    shape = (-1,) + (1,) * (x0.ndim - 1)
    return sqrt_ac.reshape(shape) * x0 + sqrt_om.reshape(shape) * noise
