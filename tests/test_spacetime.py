"""End-to-end temporal weight optimization on tiny models (CPU)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_spacetime_attn_tpu.config import (
    CLIPConfig,
    CLIPTextConfig,
    CLIPVisionConfig,
    PipelineConfig,
    SpaceTimeConfig,
    UNetConfig,
    VAEConfig,
)
from diffusion_spacetime_attn_tpu.models.clip import CLIP
from diffusion_spacetime_attn_tpu.pipeline.losses import DCLIPLoss
from diffusion_spacetime_attn_tpu.pipeline.pipeline import StableDiffusion
from diffusion_spacetime_attn_tpu.pipeline.spacetime import (
    SpaceTimeInputs,
    init_coef,
    make_train_step,
    optimize_prompt,
)
from diffusion_spacetime_attn_tpu.utils.testing import randomize_params

STEPS = 4
N = 2
IMG = 32  # 32·7/16 = 14 → clip image size 14, patch 7 → 2×2 patches


@pytest.fixture(scope="module")
def setup():
    cfg = PipelineConfig(
        unet=UNetConfig(
            model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
            attention_resolutions=(1, 2), num_heads=2, context_dim=16,
        ),
        vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
        text_encoder=CLIPTextConfig(width=16, layers=2, heads=2, vocab_size=100, max_len=7),
        loss_clip=CLIPConfig(
            vision=CLIPVisionConfig(image_size=14, patch_size=7, width=16, layers=2, heads=2, projection_dim=8),
            text=CLIPTextConfig(width=16, layers=2, heads=2, vocab_size=100, max_len=7),
            projection_dim=8,
        ),
        spacetime=SpaceTimeConfig(
            num_steps=STEPS, latent_size=16, image_size=IMG, max_objects=N,
            epochs=2,
        ),
    )
    sd = StableDiffusion.create(cfg, jax.random.PRNGKey(0))
    sd = dataclasses.replace(
        sd,
        unet_params=randomize_params(sd.unet_params, jax.random.PRNGKey(1), scale=0.1),
        vae_params=randomize_params(sd.vae_params, jax.random.PRNGKey(2), scale=0.1),
        text_params=randomize_params(sd.text_params, jax.random.PRNGKey(3)),
    )
    clip_model = CLIP(cfg.loss_clip)
    clip_params = clip_model.init(
        jax.random.PRNGKey(4),
        jnp.zeros((1, 14, 14, 3)),
        jnp.zeros((1, 7), jnp.int32),
    )["params"]
    clip_params = randomize_params(clip_params, jax.random.PRNGKey(5), scale=0.1)
    loss = DCLIPLoss(clip_model, clip_params)

    B = 1
    rng = np.random.RandomState(7)
    cond = sd.encode_text(jnp.array([[1, 5, 9, 3, 2, 0, 99]], jnp.int32))
    uncond = sd.encode_text(jnp.array([[1, 2, 0, 0, 0, 0, 99]], jnp.int32))
    inputs = SpaceTimeInputs(
        cond=cond,
        uncond=uncond,
        local_contexts=jnp.array(rng.randn(B, N, 7, 16), jnp.float32) * 0.02,
        centers=jnp.array([[[0.3, 0.4], [0.7, 0.6]]], jnp.float32),
        active=jnp.ones((B, N)),
        caption_tokens=jnp.array([[1, 5, 9, 3, 2, 0, 99]], jnp.int32),
        object_tokens=jnp.array([[[1, 5, 0, 0, 0, 0, 99], [1, 9, 0, 0, 0, 0, 99]]], jnp.int32),
        x_T=jnp.array(rng.randn(B, 16, 16, 4), jnp.float32),
    )
    return sd, loss, inputs, cfg.spacetime


def test_init_coef_matches_reference():
    active = jnp.array([[1.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    coef = init_coef(active, 50, 5.0)
    assert coef.shape == (2, 3, 50)
    np.testing.assert_allclose(coef[0, 0], 2.5)  # 5.0 / 2 objects
    np.testing.assert_allclose(coef[0, 2], 0.0)  # padded slot
    np.testing.assert_allclose(coef[1, 0], 5.0)  # 5.0 / 1 object


def test_optimize_prompt_runs_and_updates(setup):
    sd, loss, inputs, st_cfg = setup
    images, coef, losses = optimize_prompt(sd, loss, inputs, st_cfg)
    assert images.shape == (1, IMG, IMG, 3)
    assert np.all(np.isfinite(np.asarray(images)))
    assert losses.shape == (st_cfg.epochs,)
    assert np.all(np.isfinite(np.asarray(losses)))
    init = np.asarray(init_coef(inputs.active, STEPS, st_cfg.init_coef))
    # Adam actually moved the weights
    assert np.abs(np.asarray(coef) - init).max() > 1e-4


def test_grads_masked_for_padded_objects(setup):
    sd, loss, inputs, st_cfg = setup
    inputs = inputs._replace(active=jnp.array([[1.0, 0.0]]))
    opt, step = make_train_step(sd, loss, st_cfg)
    from diffusion_spacetime_attn_tpu.pipeline.spacetime import model_params

    coef = init_coef(inputs.active, STEPS, st_cfg.init_coef)
    coef, _, l, _ = step(model_params(sd, loss), coef, opt.init(coef), inputs)
    # padded object's weights must not move (zero mask ⇒ zero grad)
    np.testing.assert_allclose(np.asarray(coef)[0, 1], 0.0, atol=1e-7)
    assert np.isfinite(float(l))


def test_optimize_with_dpm_sampler(setup):
    """The DPM-Solver surface works under the temporal optimization too
    (unlike the reference, where DPM-Solver is incompatible with the
    modified model signature — SURVEY §2.1 'stock samplers')."""
    sd, loss, inputs, st_cfg = setup
    import dataclasses as dc

    cfg1 = dc.replace(st_cfg, epochs=1)
    images, coef, losses = optimize_prompt(sd, loss, inputs, cfg1, sampler="dpm")
    assert np.all(np.isfinite(np.asarray(images)))
    assert np.all(np.isfinite(np.asarray(losses)))


def test_final_forward_only_image_matches_literal(setup):
    """The default fast path (last epoch forward-only) must produce the SAME
    image as the reference's literal behavior (train_step every epoch): the
    reference saves during the final epoch's forward, BEFORE the last
    optimizer step applies (`plms.py:280-288`), so the last backward can
    never influence the saved image."""
    sd, loss, inputs, st_cfg = setup
    img_fast, coef_fast, losses_fast = optimize_prompt(
        sd, loss, inputs, st_cfg, final_forward_only=True)
    img_lit, coef_lit, losses_lit = optimize_prompt(
        sd, loss, inputs, st_cfg, final_forward_only=False)
    # same image (different compiled programs → tiny fp divergence allowed)
    np.testing.assert_allclose(
        np.asarray(img_fast), np.asarray(img_lit), atol=1e-5)
    # same loss trajectory
    np.testing.assert_allclose(
        np.asarray(losses_fast), np.asarray(losses_lit), rtol=1e-5)
    # fast path returns the coef that PRODUCED the image (one fewer update)
    assert np.abs(np.asarray(coef_fast) - np.asarray(coef_lit)).max() > 0
