"""Temporal weight optimization: the paper's core loop, TPU-native.

Reference (`ldm/models/diffusion/plms.py:182-293`): per prompt, a [N, 50]
weight matrix initialized to 5/N is optimized by Adam (lr 0.005) for 3
epochs; each epoch runs the full 50-step PLMS chain with the weights driving
the attention blend, decodes the latent, computes a CLIP fidelity loss
(global + 5·Σ per-object crops) and backprops through the entire chain.

Here the chain is `jax.grad` of a `lax.scan` (per-step remat bounds memory —
the TPU replacement for 48 GB + torch per-block checkpointing), the epoch
body is ONE jitted `train_step`, and everything is batched over a prompt
axis [B] so a data mesh can shard prompts across chips (§2.5 of SURVEY:
the reference's "multi-process + process_id files" parallelism collapses
into sharding a batch dimension).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import SpaceTimeConfig
from ..ops.attention import SpatialControl
from .losses import DCLIPLoss
from .pipeline import StableDiffusion


class SpaceTimeInputs(NamedTuple):
    """Everything one optimized generation needs (pytree, fixed shapes).

    N = cfg.max_objects with `active` marking real objects; padded slots
    have zero masks in the blend and zero weight in the loss, so they are
    exact no-ops.
    """

    cond: jnp.ndarray            # [B, L, D] caption embedding
    uncond: jnp.ndarray          # [B, L, D] empty-prompt embedding
    local_contexts: jnp.ndarray  # [B, N, L, D] "a photo of <obj>" embeddings
    centers: jnp.ndarray         # [B, N, 2] layout-predicted (x, y)
    active: jnp.ndarray          # [B, N] 1.0 = real object
    caption_tokens: jnp.ndarray  # [B, Lc] CLIP(ViT-B/32) tokens of caption
    object_tokens: jnp.ndarray   # [B, N, Lc] tokens of "A photo of <obj>"
    x_T: jnp.ndarray             # [B, h, w, 4] initial noise


def init_coef(active: jnp.ndarray, num_steps: int, init_total: float) -> jnp.ndarray:
    """[B, N, S] = init_total / n_objects for active slots (`plms.py:204-209`)."""
    n = jnp.clip(jnp.sum(active, axis=-1, keepdims=True), 1.0, None)
    per = (init_total / n) * active  # [B, N]
    return jnp.repeat(per[..., None], num_steps, axis=-1)


def generation_loss(
    coef: jnp.ndarray,              # [B, N, S]
    sd: StableDiffusion,
    clip_loss: DCLIPLoss,
    inputs: SpaceTimeInputs,
    cfg: SpaceTimeConfig,
    sampler: str = "plms",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """loss (scalar), aux = decoded images [B, S, S, 3] in [0,1].

    Loss = Σ_b [ global + w_local · Σ_n active · local_n ]  (`plms.py:252-273`).
    """
    control = SpatialControl(
        local_contexts=inputs.local_contexts,
        centers=inputs.centers,
        coef=coef[:, :, 0],  # replaced per-step via coef_schedule
        active=inputs.active,
    )
    eps_fn = sd.make_eps_fn(
        inputs.cond, inputs.uncond, cfg.guidance_scale, control, coef
    )
    z = sd.sample_from(eps_fn, inputs.x_T, sampler=sampler, remat=True)
    images = sd.decode_latents(z)
    g = clip_loss.global_loss(images, inputs.caption_tokens)          # [B]
    l = clip_loss.local_loss(
        images, inputs.centers, inputs.object_tokens, inputs.active,
        crop_half=cfg.crop_half,
    )                                                                  # [B]
    return jnp.sum(g + cfg.local_loss_weight * l), images


def model_params(sd: StableDiffusion, clip_loss: DCLIPLoss):
    """The frozen-model parameter bundle passed as a jit ARGUMENT (closing
    over multi-GB params bakes them into the executable as constants)."""
    return {
        "unet": sd.unet_params,
        "vae": sd.vae_params,
        "clip": clip_loss.params,
    }


def make_train_step(
    sd: StableDiffusion,
    clip_loss: DCLIPLoss,
    cfg: SpaceTimeConfig,
    optimizer: Optional[optax.GradientTransformation] = None,
    sampler: str = "plms",
):
    """One jitted Adam epoch:
    (params, coef, opt_state, inputs) → (new_coef, new_opt_state, loss, images)."""
    import dataclasses as dc

    opt = optimizer or optax.adam(cfg.lr)

    def train_step(params, coef, opt_state, inputs: SpaceTimeInputs):
        s = dc.replace(sd, unet_params=params["unet"], vae_params=params["vae"])
        cl = DCLIPLoss(clip_loss.clip, params["clip"], clip_loss.normalize)
        (loss, images), grads = jax.value_and_grad(
            generation_loss, has_aux=True
        )(coef, s, cl, inputs, cfg, sampler)
        updates, opt_state = opt.update(grads, opt_state, coef)
        coef = optax.apply_updates(coef, updates)
        return coef, opt_state, loss, images

    return opt, jax.jit(train_step)


def make_final_forward(
    sd: StableDiffusion,
    clip_loss: DCLIPLoss,
    cfg: SpaceTimeConfig,
    sampler: str = "plms",
):
    """Jitted LAST-epoch program: (params, coef, inputs) → (loss, images).

    The reference saves its output image during the final epoch's forward,
    BEFORE the last `optimizer.step()` applies (`plms.py:280-288`) — so the
    final epoch's entire backward-through-chain only moves weights nobody
    reads.  Running the last epoch without grad produces the identical
    image and skips one full backward (measured: DPM20 b8 method
    4.07 → 3.05 s/optimized prompt; docs/BENCHMARKS.md round 3)."""
    import dataclasses as dc

    def final_forward(params, coef, inputs: SpaceTimeInputs):
        s = dc.replace(sd, unet_params=params["unet"], vae_params=params["vae"])
        cl = DCLIPLoss(clip_loss.clip, params["clip"], clip_loss.normalize)
        return generation_loss(coef, s, cl, inputs, cfg, sampler)

    return jax.jit(final_forward)


def optimize_prompt(
    sd: StableDiffusion,
    clip_loss: DCLIPLoss,
    inputs: SpaceTimeInputs,
    cfg: SpaceTimeConfig,
    sampler: str = "plms",
    train_step=None,
    optimizer=None,
    final_forward=None,
    final_forward_only: bool = True,
    on_epoch=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Any]:
    """Full 3-epoch optimization; returns (final images, coef, losses).

    Matches the reference epoch structure: the returned image is the one
    decoded during the *last* epoch's forward (i.e. produced with the
    weights as of the start of that epoch — `plms.py:280-288` saves at
    epoch 2 before the final optimizer step applies).  Because that final
    optimizer step never influences the saved image, the default
    `final_forward_only=True` runs the last epoch as a forward-only jit
    (identical image, one full backward skipped); the returned `coef` is
    then the one that PRODUCED the image.  Pass `final_forward_only=False`
    for the reference's literal do-the-dead-update behavior.

    `on_epoch(e, images)` — optional callback fired with every epoch's
    decoded images (the reference saves `final{e}_s{seed}_index_{i}.png`
    for EVERY epoch, `plms.py:280-288`; runners use this to reproduce
    that artifact contract behind a flag).
    """
    if train_step is None:
        optimizer, train_step = make_train_step(sd, clip_loss, cfg, optimizer, sampler)
    params = model_params(sd, clip_loss)
    coef = init_coef(inputs.active, cfg.num_steps, cfg.init_coef)
    opt_state = optimizer.init(coef)
    losses = []
    images = None
    n_train = cfg.epochs - 1 if final_forward_only else cfg.epochs
    for e in range(n_train):
        coef, opt_state, loss, images = train_step(params, coef, opt_state, inputs)
        losses.append(loss)
        if on_epoch is not None:
            on_epoch(e, images)
    if final_forward_only:
        if final_forward is None:
            final_forward = make_final_forward(sd, clip_loss, cfg, sampler)
        loss, images = final_forward(params, coef, inputs)
        losses.append(loss)
        if on_epoch is not None:
            on_epoch(cfg.epochs - 1, images)
    return images, coef, jnp.stack(losses)
