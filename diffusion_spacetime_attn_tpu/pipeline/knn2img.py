"""Retrieval-augmented diffusion (the reference's knn2img pipeline).

Reference: `scripts/knn2img.py` + `configs/retrieval-augmented-diffusion/
768x768.yaml` — a LatentDiffusion whose conditioning is the CLIP ViT-L/14
*joint-space* embedding of the prompt, optionally concatenated with the
embeddings of its k nearest neighbors from a retrieval database
(`knn2img.py:355-363`):

    c  = concat([clip_text(prompt)[:, None, :], nn_embeddings], axis=1)
    uc = zeros_like(c)                        # (`knn2img.py:364-365`)
    eps = eps(x, uc) + scale·(eps(x, c) − eps(x, uc))

Model: f16 KL autoencoder (z=16) + UNet(448ch, mult 1/2/3/4, head width 32,
context 768) at 768² → 48×48×16 latents.  Everything runs through the same
samplers / CFG machinery as the SD pipeline; the retrieval matmul and the
sampling chain are one jitted program per batch shape.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import ScheduleConfig, UNetConfig, VAEConfig
from ..models.unet import UNet
from ..models.vae import AutoencoderKL
from ..ops.schedule import DiffusionSchedule, make_schedule
from ..samplers import ddim_sample, dpm_solver_sample, plms_sample
from .retrieval import Retriever, normalize


def rdm_unet_config(dtype: str = "bfloat16") -> UNetConfig:
    """The 768×768 RDM UNet (`768x768.yaml:19-41`)."""
    return UNetConfig(
        in_channels=16, out_channels=16, model_channels=448,
        channel_mult=(1, 2, 3, 4), num_res_blocks=2,
        attention_resolutions=(4, 2, 1), num_head_channels=32,
        context_dim=768, dtype=dtype,
    )


def rdm_vae_config(dtype: str = "bfloat16") -> VAEConfig:
    """The f16 first stage (`768x768.yaml:43-64`)."""
    return VAEConfig(
        ch=128, ch_mult=(1, 1, 2, 2, 4), num_res_blocks=2,
        z_channels=16, embed_dim=16, attn_resolutions=(16,),
        resolution=256, scale_factor=0.22765929, dtype=dtype,
    )


def rdm_schedule_config() -> ScheduleConfig:
    """`768x768.yaml:5-6` (linear_start/end differ from SD v1)."""
    return ScheduleConfig(linear_start=0.0015, linear_end=0.015)


@dataclasses.dataclass
class RetrievalAugmentedDiffusion:
    """Model bundle for knn2img (reference `LatentDiffusion` + `Searcher`)."""

    unet: UNet
    vae: AutoencoderKL
    unet_params: Any
    vae_params: Any
    schedule: DiffusionSchedule
    scale_factor: float
    latent_hw: int = 48

    @classmethod
    def create(cls, rng: jax.Array, steps: int = 50, dtype: str = "bfloat16",
               tiny: bool = False, abstract: bool = True,
               eta: float = 0.0) -> "RetrievalAugmentedDiffusion":
        if tiny:
            ucfg = UNetConfig(in_channels=8, out_channels=8, model_channels=32,
                              channel_mult=(1, 2), num_res_blocks=1,
                              attention_resolutions=(1, 2), num_head_channels=16,
                              context_dim=16, dtype=dtype)
            vcfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                             z_channels=8, embed_dim=8, dtype=dtype,
                             scale_factor=0.22765929)
            latent_hw = 8
        else:
            ucfg, vcfg = rdm_unet_config(dtype), rdm_vae_config(dtype)
            latent_hw = 48
        unet = UNet(ucfg, radius=0.2)
        vae = AutoencoderKL(vcfg)
        r1, r2 = jax.random.split(rng)
        x = jnp.zeros((2, latent_hw, latent_hw, ucfg.in_channels))
        t = jnp.zeros((2,), jnp.int32)
        ctx = jnp.zeros((2, 4, ucfg.context_dim))
        img = jnp.zeros((1, 16 * latent_hw, 16 * latent_hw, 3))
        init_u = lambda: unet.init(r1, x, t, ctx)["params"]
        init_v = lambda: vae.init(r2, img)["params"]
        if abstract:
            unet_params = jax.eval_shape(init_u)
            vae_params = jax.eval_shape(init_v)
        else:
            unet_params, vae_params = init_u(), init_v()
        sched = make_schedule(rdm_schedule_config(), steps, eta=eta)
        return cls(unet, vae, unet_params, vae_params, sched,
                   vcfg.scale_factor, latent_hw)

    def build_conditioning(
        self,
        text_embed: jnp.ndarray,               # [B, D] joint-space CLIP
        retriever: Optional[Retriever] = None,
        knn: int = 10,
    ) -> jnp.ndarray:
        """`knn2img.py:355-363`: normalized text embedding, optionally
        concatenated with its k nearest database neighbors."""
        c = normalize(text_embed)[:, None, :]   # [B, 1, D]
        if retriever is not None and knn > 0:
            nn_emb = retriever.search(c[:, 0], knn)["nn_embeddings"]
            c = jnp.concatenate([c, nn_emb.astype(c.dtype)], axis=1)
        return c

    def sample(
        self,
        cond: jnp.ndarray,                      # [B, 1+knn, D]
        rng: jax.Array,
        guidance_scale: float = 5.0,            # reference default (`knn2img.py:381`)
        sampler: str = "ddim",
    ) -> jnp.ndarray:
        """Conditioning → images in [0, 1].  uncond = zeros (`knn2img.py:364`).

        NOTE: closes over the bundle's params — fine eagerly or at tiny
        scale, but jit `sample_with_params` instead for the full model
        (closed-over params bake GBs of constants into the executable)."""
        return self.sample_with_params(
            self.unet_params, self.vae_params, cond, rng,
            guidance_scale=guidance_scale, sampler=sampler)

    def sample_with_params(
        self,
        unet_params,
        vae_params,
        cond: jnp.ndarray,
        rng: jax.Array,
        guidance_scale: float = 5.0,
        sampler: str = "ddim",
    ) -> jnp.ndarray:
        """Pure-function variant: params are explicit jit arguments."""
        B = cond.shape[0]
        uc = jnp.zeros_like(cond)
        context = jnp.concatenate([uc, cond], axis=0)

        def eps_fn(x, t, i):
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.full((2 * B,), t, jnp.int32)
            e = self.unet.apply({"params": unet_params}, x_in, t_in, context)
            e_u, e_c = e[:B], e[B:]
            return e_u + guidance_scale * (e_c - e_u)

        rng, noise_rng = jax.random.split(rng)
        x_T = jax.random.normal(
            rng, (B, self.latent_hw, self.latent_hw,
                  self.unet.cfg.in_channels), jnp.float32)
        fn = {"ddim": ddim_sample, "plms": plms_sample,
              "dpm": dpm_solver_sample}[sampler]
        # With eta>0 the schedule bakes nonzero DDIM sigmas: the sampler must
        # add the compensating noise, so thread an rng (stochastic=True).
        # eta==0 keeps the deterministic path (rng=None) for all samplers.
        import numpy as np

        stochastic = sampler == "ddim" and bool(
            np.any(np.asarray(self.schedule.sigmas) > 0))
        z = fn(eps_fn, x_T, self.schedule, remat=False,
               **({"rng": noise_rng} if stochastic else {}))
        img = self.vae.apply({"params": vae_params}, z / self.scale_factor,
                             method=AutoencoderKL.decode)
        return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)
