"""Stable-Diffusion pipeline glue: model bundle, CFG eps functions, txt2img.

This is the TPU-native replacement for the reference's `LatentDiffusion`
orchestration (`ldm/models/diffusion/ddpm.py:424-905`): a plain pytree of
parameters plus pure functions.  Classifier-free guidance uses a stacked
[2B] batch (uncond rows first, cond rows second — the reference's
`torch.cat([x] * 2)` at `plms.py:304-307`), so each denoise step is a single
large UNet call.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..models.clip import CLIPTextTower
from ..models.unet import UNet
from ..models.vae import AutoencoderKL
from ..ops.attention import SpatialControl
from ..ops.schedule import DiffusionSchedule, make_schedule
from ..samplers import ddim_sample, dpm_solver_sample, plms_sample


@dataclasses.dataclass
class StableDiffusion:
    """Model bundle: modules + parameter pytrees + schedule."""

    cfg: PipelineConfig
    unet: UNet
    vae: AutoencoderKL
    text_encoder: CLIPTextTower
    unet_params: Any
    vae_params: Any
    text_params: Any
    schedule: DiffusionSchedule

    @classmethod
    def create(
        cls, cfg: PipelineConfig, rng: jax.Array, abstract: bool = False
    ) -> "StableDiffusion":
        """Random-init bundle (weight loading via utils.convert).

        abstract=True skips device work entirely (params are
        ShapeDtypeStructs from eval_shape) — callers then fill them via
        `utils.testing.randomize_params` or a converter.  This matters on a
        tunneled TPU where eager flax init is thousands of tiny dispatches.
        """
        unet = UNet(cfg.unet, radius=cfg.spacetime.radius)
        vae = AutoencoderKL(cfg.vae)
        text = CLIPTextTower(cfg.text_encoder)
        r1, r2, r3 = jax.random.split(rng, 3)
        latent = cfg.spacetime.latent_size
        x = jnp.zeros((2, latent, latent, cfg.unet.in_channels))
        t = jnp.zeros((2,), jnp.int32)
        ctx = jnp.zeros((2, cfg.text_encoder.max_len, cfg.unet.context_dim))
        img = jnp.zeros((1, 64, 64, 3))
        tokens = jnp.zeros((1, cfg.text_encoder.max_len), jnp.int32)
        if abstract:
            unet_params = jax.eval_shape(unet.init, r1, x, t, ctx)["params"]
            vae_params = jax.eval_shape(vae.init, r2, img)["params"]
            text_params = jax.eval_shape(text.init, r3, tokens)["params"]
        else:
            unet_params = unet.init(r1, x, t, ctx)["params"]
            vae_params = vae.init(r2, img)["params"]
            text_params = text.init(r3, tokens)["params"]
        sched = make_schedule(cfg.schedule, cfg.spacetime.num_steps)
        return cls(cfg, unet, vae, text, unet_params, vae_params, text_params, sched)

    # ---- text ----
    def encode_text(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        """[B, 77] int32 → [B, 77, 768] (reference `ddpm.py:551`
        get_learned_conditioning)."""
        hidden, _ = self.text_encoder.apply({"params": self.text_params}, token_ids)
        return hidden

    # ---- VAE ----
    def decode_latents(self, z: jnp.ndarray) -> jnp.ndarray:
        """Scaled latents → images in [0,1] (reference `ddpm.py:706`
        decode_first_stage + the clamp at `plms.py:250`)."""
        img = self.vae.apply(
            {"params": self.vae_params},
            z / self.cfg.vae.scale_factor,
            method=AutoencoderKL.decode,
        )
        return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)

    def encode_images(self, img: jnp.ndarray, rng=None) -> jnp.ndarray:
        """images in [-1,1] → scaled latents."""
        z = self.vae.apply(
            {"params": self.vae_params}, img, rng, method=AutoencoderKL.encode
        )
        return z * self.cfg.vae.scale_factor

    # ---- eps functions ----
    def make_eps_fn(
        self,
        cond: jnp.ndarray,          # [B, L, D]
        uncond: jnp.ndarray,        # [B, L, D]
        guidance_scale: float,
        control: Optional[SpatialControl] = None,
        coef_schedule: Optional[jnp.ndarray] = None,  # [B, N, S] per-step weights
    ):
        """Returns eps_fn(x [B,h,w,c], t scalar, i scalar) with CFG.

        With `control`, `coef_schedule[:, :, i]` supplies the per-step blend
        weights (reference `plms.py:243` passes `weighting_parameter[:, i]`).
        """
        context = jnp.concatenate([uncond, cond], axis=0)  # [2B, L, D]

        def eps_fn(x, t, i):
            B = x.shape[0]
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.full((2 * B,), t, dtype=jnp.int32)
            ctrl = control
            if ctrl is not None and coef_schedule is not None:
                ctrl = ctrl._replace(coef=coef_schedule[:, :, i])
            e = self.unet.apply(
                {"params": self.unet_params}, x_in, t_in, context, ctrl
            )
            e_u, e_c = e[:B], e[B:]
            return e_u + guidance_scale * (e_c - e_u)

        return eps_fn

    # ---- end-to-end txt2img ----
    def sample_latents(
        self,
        eps_fn,
        rng: jax.Array,
        batch: int = 1,
        sampler: str = "plms",
        remat: bool = True,
    ) -> jnp.ndarray:
        latent = self.cfg.spacetime.latent_size
        x_T = jax.random.normal(
            rng, (batch, latent, latent, self.cfg.unet.in_channels), jnp.float32
        )
        return self.sample_from(eps_fn, x_T, sampler, remat)

    def sample_from(self, eps_fn, x_T, sampler: str = "plms", remat: bool = True):
        if sampler == "plms":
            return plms_sample(eps_fn, x_T, self.schedule, remat=remat)
        if sampler == "ddim":
            return ddim_sample(eps_fn, x_T, self.schedule, remat=remat)
        if sampler == "dpm":
            return dpm_solver_sample(eps_fn, x_T, self.schedule, remat=remat)
        raise ValueError(f"unknown sampler {sampler!r}")

    def txt2img(
        self,
        cond: jnp.ndarray,
        uncond: jnp.ndarray,
        rng: jax.Array,
        guidance_scale: Optional[float] = None,
        sampler: str = "plms",
        control: Optional[SpatialControl] = None,
        coef_schedule: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Full txt2img: embeddings → latents → images in [0,1].

        Covers the vanilla path (`scripts/txt2img.py`) with control=None and
        the spatial-only path (fixed coef_schedule) in one function.
        """
        gs = self.cfg.spacetime.guidance_scale if guidance_scale is None else guidance_scale
        eps_fn = self.make_eps_fn(cond, uncond, gs, control, coef_schedule)
        z = self.sample_latents(eps_fn, rng, batch=cond.shape[0], sampler=sampler)
        return self.decode_latents(z)
