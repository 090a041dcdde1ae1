"""img2img and inpainting pipelines (reference: `scripts/img2img.py`,
`scripts/inpaint.py` — stock CompVis utilities on the capability checklist).

img2img: encode the init image, noise it to timestep ⌈strength·S⌉, run the
remaining DDIM steps.  inpaint: full chain with the masked region re-noised
from x0 each step (reference `plms.py:232-235` mask path).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.schedule import q_sample
from ..samplers.ddim import ddim_sample
from .pipeline import StableDiffusion


def img2img(
    sd: StableDiffusion,
    init_image: jnp.ndarray,   # [B, H, W, 3] in [-1, 1]
    cond: jnp.ndarray,
    uncond: jnp.ndarray,
    rng: jax.Array,
    strength: float = 0.75,
    guidance_scale: Optional[float] = None,
) -> jnp.ndarray:
    """→ images in [0, 1].  strength ∈ (0, 1]: fraction of the chain run."""
    if not 0.0 < strength <= 1.0:
        raise ValueError("strength must be in (0, 1]")
    S = sd.schedule.num_steps
    start_step = S - int(strength * S)  # loop position to start from
    r_enc, r_noise = jax.random.split(rng)
    z0 = sd.encode_images(init_image, r_enc).astype(jnp.float32)  # f32 carry
    noise = jax.random.normal(r_noise, z0.shape, z0.dtype)
    t_enc = jnp.broadcast_to(sd.schedule.timesteps[start_step], (z0.shape[0],))
    z_T = q_sample(sd.schedule, z0, t_enc, noise)
    gs = sd.cfg.spacetime.guidance_scale if guidance_scale is None else guidance_scale
    eps_fn = sd.make_eps_fn(cond, uncond, gs)
    z = ddim_sample(eps_fn, z_T, sd.schedule, remat=False, start_step=start_step)
    return sd.decode_latents(z)


def inpaint(
    sd: StableDiffusion,
    init_image: jnp.ndarray,     # [B, H, W, 3] in [-1, 1]
    image_mask: jnp.ndarray,     # [B, H, W, 1]: 1 = KEEP, 0 = generate
    cond: jnp.ndarray,
    uncond: jnp.ndarray,
    rng: jax.Array,
    guidance_scale: Optional[float] = None,
) -> jnp.ndarray:
    r_enc, r_T = jax.random.split(rng)
    # latents ride the sampler carry in f32 regardless of the VAE compute
    # dtype (sampler convention, cf. pipeline.sample_latents; a bf16 z0 would
    # flip the lax.scan carry dtype mid-body and fail to trace)
    z0 = sd.encode_images(init_image, r_enc).astype(jnp.float32)
    # downsample the mask to latent resolution (f=8, nearest)
    B, h, w, _ = z0.shape
    mask = jax.image.resize(image_mask, (B, h, w, 1), method="nearest")
    x_T = jax.random.normal(r_T, z0.shape, jnp.float32)
    gs = sd.cfg.spacetime.guidance_scale if guidance_scale is None else guidance_scale
    eps_fn = sd.make_eps_fn(cond, uncond, gs)
    z = ddim_sample(
        eps_fn, x_T, sd.schedule, rng=None, remat=False, mask=mask, x0=z0
    )
    return sd.decode_latents(z)
