"""Batched runner over an 8-device CPU data mesh, tiny models."""
import dataclasses
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_spacetime_attn_tpu.config import (
    CLIPConfig,
    CLIPTextConfig,
    CLIPVisionConfig,
    LayoutConfig,
    PipelineConfig,
    SpaceTimeConfig,
    UNetConfig,
    VAEConfig,
)
from diffusion_spacetime_attn_tpu.models.clip import CLIP
from diffusion_spacetime_attn_tpu.models.layout.model import create_layout_predictor
from diffusion_spacetime_attn_tpu.parallel.mesh import make_mesh
from diffusion_spacetime_attn_tpu.pipeline.batch_runner import BatchedRunner
from diffusion_spacetime_attn_tpu.pipeline.frontend import LayoutInference
from diffusion_spacetime_attn_tpu.pipeline.losses import DCLIPLoss
from diffusion_spacetime_attn_tpu.pipeline.pipeline import StableDiffusion
from diffusion_spacetime_attn_tpu.pipeline.runners import PromptRunner
from diffusion_spacetime_attn_tpu.utils.testing import randomize_params
from diffusion_spacetime_attn_tpu.utils.tokenizer import (
    make_clip_tokenizer,
    make_roberta_tokenizer,
)

PROMPTS = [
    "a dog to the left of a cat",
    "a car above a bench",
    "no objects here at all",        # layout fails → skipped
    "the bird sits on a chair",
    "a cup next to a laptop",
]


@pytest.fixture(scope="module")
def runner():
    cfg = PipelineConfig(
        unet=UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                        attention_resolutions=(1, 2), num_heads=2, context_dim=16),
        vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
        text_encoder=CLIPTextConfig(width=16, layers=2, heads=2, vocab_size=49408, max_len=12),
        loss_clip=CLIPConfig(
            vision=CLIPVisionConfig(image_size=14, patch_size=7, width=16, layers=2, heads=2, projection_dim=8),
            text=CLIPTextConfig(width=16, layers=2, heads=2, vocab_size=49408, max_len=12),
            projection_dim=8,
        ),
        spacetime=SpaceTimeConfig(num_steps=3, latent_size=16, image_size=32,
                                  max_objects=2, epochs=1),
    )
    sd = StableDiffusion.create(cfg, jax.random.PRNGKey(0))
    sd = dataclasses.replace(
        sd,
        unet_params=randomize_params(sd.unet_params, jax.random.PRNGKey(1), 0.1),
        vae_params=randomize_params(sd.vae_params, jax.random.PRNGKey(2), 0.1),
        text_params=randomize_params(sd.text_params, jax.random.PRNGKey(3)),
    )
    clip_model = CLIP(cfg.loss_clip)
    cp = randomize_params(
        clip_model.init(
            jax.random.PRNGKey(4), jnp.zeros((1, 14, 14, 3)),
            jnp.zeros((1, 12), jnp.int32),
        )["params"],
        jax.random.PRNGKey(5), 0.1,
    )
    lcfg = LayoutConfig(vocab_size=50265, hidden=32, layers=1, heads=2,
                        ffn_dim=64, max_positions=140, max_len=24)
    lmodel, lparams = create_layout_predictor(lcfg, jax.random.PRNGKey(6))
    lparams = randomize_params(lparams, jax.random.PRNGKey(7), 0.05)
    tok = make_clip_tokenizer(max_len=12)
    outdir = tempfile.mkdtemp()
    return PromptRunner(
        sd=sd,
        clip_loss=DCLIPLoss(clip_model, cp),
        layout=LayoutInference(lmodel, lparams, make_roberta_tokenizer(), 24),
        clip_tokenize=lambda t: tok.pad_to(tok.encode(t), 12),
        text_tokenize=lambda t: tok.pad_to(tok.encode(t), 12),
        cfg=cfg.spacetime,
        outdir=outdir,
        mode="spacetime",
    )


def test_batched_spacetime_on_mesh(runner):
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    br = BatchedRunner(runner, batch_size=4, mesh=mesh)
    with mesh:
        produced = br.run(PROMPTS)
    # prompt 2 has no COCO objects → skipped
    assert produced == 4
    files = sorted(os.listdir(runner.outdir))
    assert "final0_s1_index_0.png" in files
    assert "final0_s1_index_2.png" not in files
    assert "final0_s1_index_4.png" in files


def test_batched_vanilla(runner):
    runner.mode = "vanilla"
    br = BatchedRunner(runner, batch_size=2)
    produced = br.run(PROMPTS[:2], indices=[0, 1], seed=7)
    assert produced == 2
    runner.mode = "spacetime"


def test_batched_matches_sequential(runner):
    """Batching must be semantics-preserving: same prompt → same image."""
    import numpy as np
    from PIL import Image

    runner.mode = "vanilla"
    br = BatchedRunner(runner, batch_size=2)  # prompt 0 + one pad slot
    br.run(PROMPTS, indices=[0], seed=3)
    batched = np.asarray(
        Image.open(os.path.join(runner.outdir, "final0_s3_index_0.png"))
    )
    seq = runner.run_one(PROMPTS[0], 0, seed=3)
    sequential = (np.asarray(seq) * 255).clip(0, 255).astype(np.uint8)
    runner.mode = "spacetime"
    # identical up to PNG quantization
    assert np.abs(batched.astype(int) - sequential.astype(int)).max() <= 1
