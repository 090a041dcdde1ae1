import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_spacetime_attn_tpu.config import (
    CLIPTextConfig,
    PipelineConfig,
    SpaceTimeConfig,
    UNetConfig,
    VAEConfig,
)
from diffusion_spacetime_attn_tpu.pipeline.img2img import img2img, inpaint
from diffusion_spacetime_attn_tpu.pipeline.pipeline import StableDiffusion
from diffusion_spacetime_attn_tpu.pipeline.safety import SafetyChecker
from diffusion_spacetime_attn_tpu.utils.testing import randomize_params
from diffusion_spacetime_attn_tpu.utils.watermark import (
    decode_watermark,
    embed_watermark,
)


@pytest.fixture(scope="module")
def tiny_sd():
    cfg = PipelineConfig(
        unet=UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                        attention_resolutions=(1, 2), num_heads=2, context_dim=16),
        vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
        text_encoder=CLIPTextConfig(width=16, layers=2, heads=2, vocab_size=100, max_len=7),
        spacetime=SpaceTimeConfig(num_steps=6, latent_size=8, image_size=16, max_objects=2),
    )
    sd = StableDiffusion.create(cfg, jax.random.PRNGKey(0))
    return dataclasses.replace(
        sd,
        unet_params=randomize_params(sd.unet_params, jax.random.PRNGKey(1), 0.1),
        vae_params=randomize_params(sd.vae_params, jax.random.PRNGKey(2), 0.1),
        text_params=randomize_params(sd.text_params, jax.random.PRNGKey(3)),
    )


def test_img2img_runs(tiny_sd):
    sd = tiny_sd
    rng = np.random.RandomState(0)
    init = jnp.array(rng.rand(1, 16, 16, 3) * 2 - 1, jnp.float32)
    cond = sd.encode_text(jnp.array([[1, 5, 9, 3, 2, 0, 99]], jnp.int32))
    uncond = sd.encode_text(jnp.array([[1, 2, 0, 0, 0, 0, 99]], jnp.int32))
    out = img2img(sd, init, cond, uncond, jax.random.PRNGKey(0), strength=0.5)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    with pytest.raises(ValueError):
        img2img(sd, init, cond, uncond, jax.random.PRNGKey(0), strength=0.0)


def test_inpaint_runs(tiny_sd):
    sd = tiny_sd
    rng = np.random.RandomState(1)
    init = jnp.array(rng.rand(1, 16, 16, 3) * 2 - 1, jnp.float32)
    mask = jnp.zeros((1, 16, 16, 1)).at[:, :8].set(1.0)
    cond = sd.encode_text(jnp.array([[1, 5, 9, 3, 2, 0, 99]], jnp.int32))
    uncond = sd.encode_text(jnp.array([[1, 2, 0, 0, 0, 0, 99]], jnp.int32))
    out = inpaint(sd, init, mask, cond, uncond, jax.random.PRNGKey(0))
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_watermark_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (128, 128, 3), np.uint8)
    wm = embed_watermark(img, "SDV1")
    assert decode_watermark(wm, 4) == "SDV1"
    # imperceptible: at most 1 LSB of the blue channel
    assert np.abs(wm.astype(int) - img.astype(int)).max() <= 1
    assert (wm[..., :2] == img[..., :2]).all()


def test_safety_checker_noop_and_flagging():
    imgs = jnp.ones((2, 8, 8, 3)) * 0.5
    checker = SafetyChecker()
    out, flags = checker(imgs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))
    assert not flags.any()


def test_img2img_inpaint_bf16_vae():
    """Regression: a bf16 VAE used to flip the DDIM scan carry dtype mid-body
    (bf16 z0 → f32 q_sample output) and fail to trace; latents must ride the
    sampler carry in f32 regardless of compute dtype."""
    cfg = PipelineConfig(
        unet=UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                        attention_resolutions=(1, 2), num_heads=2, context_dim=16,
                        dtype="bfloat16"),
        vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, dtype="bfloat16"),
        text_encoder=CLIPTextConfig(width=16, layers=2, heads=2, vocab_size=100, max_len=7),
        spacetime=SpaceTimeConfig(num_steps=4, latent_size=8, image_size=16, max_objects=2),
    )
    sd = StableDiffusion.create(cfg, jax.random.PRNGKey(0))
    sd = dataclasses.replace(
        sd,
        unet_params=randomize_params(sd.unet_params, jax.random.PRNGKey(1), 0.1),
        vae_params=randomize_params(sd.vae_params, jax.random.PRNGKey(2), 0.1),
        text_params=randomize_params(sd.text_params, jax.random.PRNGKey(3)),
    )
    rng = np.random.RandomState(0)
    init = jnp.array(rng.rand(1, 16, 16, 3) * 2 - 1, jnp.float32)
    mask = jnp.array((rng.rand(1, 16, 16, 1) > 0.5), jnp.float32)
    cond = sd.encode_text(jnp.array([[1, 5, 9, 3, 2, 0, 99]], jnp.int32))
    uncond = sd.encode_text(jnp.array([[1, 2, 0, 0, 0, 0, 99]], jnp.int32))
    out = inpaint(sd, init, mask, cond, uncond, jax.random.PRNGKey(0))
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    out2 = img2img(sd, init, cond, uncond, jax.random.PRNGKey(0), strength=0.5)
    assert np.isfinite(np.asarray(out2)).all()


def test_conditional_ldm_encoders():
    """ClassEmbedder / TransformerEmbedder / BERTEmbedder (reference
    `ldm/modules/encoders/modules.py:21-103` over x_transformer)."""
    import jax
    import jax.numpy as jnp

    from diffusion_spacetime_attn_tpu.models.encoders import (
        BERTEmbedder, ClassEmbedder, TransformerEmbedder,
    )

    ce = ClassEmbedder(n_classes=10, embed_dim=16)
    p = ce.init(jax.random.PRNGKey(0), jnp.zeros((2,), jnp.int32))["params"]
    out = ce.apply({"params": p}, jnp.array([3, 7]))
    assert out.shape == (2, 1, 16)
    assert not jnp.allclose(out[0], out[1])  # distinct classes differ

    te = TransformerEmbedder(vocab_size=50, max_seq_len=9, n_embed=16,
                             n_layer=2, heads=2)
    toks = jnp.asarray(np.random.RandomState(0).randint(0, 50, (2, 9)))
    p = te.init(jax.random.PRNGKey(0), toks)["params"]
    h = te.apply({"params": p}, toks)
    assert h.shape == (2, 9, 16) and bool(jnp.all(jnp.isfinite(h)))

    be = BERTEmbedder(n_embed=16, n_layer=2, vocab_size=50, max_seq_len=9,
                      heads=2)
    p = be.init(jax.random.PRNGKey(0), toks)["params"]
    h = be.apply({"params": p}, toks)
    assert h.shape == (2, 9, 16)


def test_bsrgan_light_degradation():
    """Degradation pipeline (reference `bsrgan_light.py:534-`): shapes,
    range, determinism by seed, and an ImageNetSR-style record."""
    from diffusion_spacetime_attn_tpu.training.degradation import (
        degradation_bsrgan_light, superres_example,
    )

    img = np.random.RandomState(0).rand(67, 93, 3).astype(np.float32)
    lq, hq = degradation_bsrgan_light(img, sf=4, seed=11)
    assert hq.shape == (64, 92, 3)
    assert lq.shape == (16, 23, 3)
    assert 0.0 <= lq.min() and lq.max() <= 1.0
    lq2, _ = degradation_bsrgan_light(img, sf=4, seed=11)
    np.testing.assert_array_equal(lq, lq2)          # seeded determinism
    lq3, _ = degradation_bsrgan_light(img, sf=4, seed=12)
    assert (lq3 != lq).any()
    # degraded LR differs from a clean downsample (it's actually degraded)
    rec = superres_example(img, size=64, sf=4, seed=3)
    assert rec["image"].shape == (64, 64, 3)
    assert rec["LR_image"].shape == (16, 16, 3)
    assert rec["image"].min() >= -1.0 and rec["image"].max() <= 1.0
    clean = superres_example(img, size=64, sf=4, degradation="bicubic")
    assert np.abs(rec["LR_image"] - clean["LR_image"]).mean() > 1e-3


def test_diffusers_safety_checker_faithful():
    """`DiffusersSafetyChecker.from_checkpoint` on a synthesized
    diffusers-named state dict must reproduce the diffusers scoring formula
    (torch oracle replicated here) bit-for-decision."""
    import torch

    from transformers import CLIPVisionConfig as HFVCfg, CLIPVisionModel

    from diffusion_spacetime_attn_tpu.config import CLIPVisionConfig
    from diffusion_spacetime_attn_tpu.pipeline.safety import (
        CLIP_IMAGE_MEAN,
        CLIP_IMAGE_STD,
        DiffusersSafetyChecker,
    )

    hf_cfg = HFVCfg(hidden_size=32, intermediate_size=128, num_hidden_layers=2,
                    num_attention_heads=2, image_size=28, patch_size=14,
                    hidden_act="quick_gelu")
    torch.manual_seed(5)
    hf = CLIPVisionModel(hf_cfg).eval()
    proj = torch.nn.Linear(32, 8, bias=False)
    rng = np.random.RandomState(6)
    concepts = rng.randn(4, 8).astype(np.float32)
    specials = rng.randn(2, 8).astype(np.float32)
    concept_w = np.full(4, 0.5, np.float32)
    special_w = np.full(2, 0.6, np.float32)

    state = {f"vision_model.vision_model.{k}": v.detach().numpy()
             for k, v in hf.vision_model.state_dict().items()}
    state["visual_projection.weight"] = proj.weight.detach().numpy()
    state["concept_embeds"] = concepts
    state["special_care_embeds"] = specials
    state["concept_embeds_weights"] = concept_w
    state["special_care_embeds_weights"] = special_w

    cfg = CLIPVisionConfig(image_size=28, patch_size=14, width=32, layers=2,
                           heads=2, projection_dim=8)
    checker = DiffusersSafetyChecker.from_checkpoint(state, cfg=cfg)

    imgs = rng.rand(3, 28, 28, 3).astype(np.float32)  # tower size: no resize
    out, flags = checker(jnp.asarray(imgs))

    # torch oracle (diffusers safety_checker.py forward)
    px = (imgs - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    with torch.no_grad():
        pooled = hf(torch.from_numpy(px.transpose(0, 3, 1, 2))).pooler_output
        emb = proj(pooled)
        embn = emb / emb.norm(dim=-1, keepdim=True)
        cn = torch.from_numpy(concepts)
        cn = cn / cn.norm(dim=-1, keepdim=True)
        sn = torch.from_numpy(specials)
        sn = sn / sn.norm(dim=-1, keepdim=True)
        ss = embn @ sn.T - torch.from_numpy(special_w)
        adj = (ss > 0).any(-1).float()[:, None] * 0.01
        cs = embn @ cn.T - torch.from_numpy(concept_w) + adj
        expect_flags = (cs > 0).any(-1).numpy()

    np.testing.assert_array_equal(flags, expect_flags)
    got_emb = np.asarray(checker.image_embeds(jnp.asarray(imgs)))
    np.testing.assert_allclose(got_emb, emb.numpy(), atol=2e-4)
    # flagged rows are black, clean rows untouched
    for i, f in enumerate(flags):
        if f:
            assert float(np.abs(np.asarray(out[i])).max()) == 0.0
        else:
            np.testing.assert_array_equal(np.asarray(out[i]), imgs[i])


def test_scripts_dir_shadows_no_stdlib_module():
    """No file in scripts/ may shadow a stdlib module: test_ingest_drill (and
    any user) puts scripts/ on sys.path, and a shadow can poison lazy import
    machinery far away (scripts/profile.py shadowing stdlib `profile` broke
    `from transformers import CLIPVisionModel` with a GenerationMixin
    ImportError — collection-order dependent, round 3)."""
    import os
    import sys

    scripts = os.path.join(os.path.dirname(__file__), "..", "scripts")
    stdlib = set(sys.stdlib_module_names)
    offenders = [
        f for f in os.listdir(scripts)
        if f.endswith(".py") and f[:-3] in stdlib
    ]
    assert offenders == [], f"scripts/ shadows stdlib modules: {offenders}"
