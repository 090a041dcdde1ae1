"""Full-scale (production v1 config) parity vs the reference modules.

The tiny-scale tests in test_parity.py prove the *architecture mapping*; these
prove the *production config wiring* — 320ch / mult (1,2,4,4) / 8 heads
(d_head 40·80·160) / ctx 768 / attention at ds 1,2,4 — exactly
`configs/stable-diffusion/v1-inference.yaml:30-44` and
`ldm/modules/diffusionmodules/openaimodel.py:710-742` — and exercise
`convert_sd_unet`/`convert_sd_vae`/`convert_hf_clip_text` full-depth key
mappings on real-shape state dicts.  Random weights (no checkpoints in env),
forward parity in f32 on CPU.

Marked `slow`; run by default (deselect with `-m "not slow"`).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusion_spacetime_attn_tpu.config import CLIPTextConfig, UNetConfig, VAEConfig
from diffusion_spacetime_attn_tpu.utils import convert

from test_parity import REF_SD, reference_path, to_np  # noqa: F401

pytestmark = pytest.mark.slow


def _randomize_zero_params(module, std=0.02):
    """The reference zero-inits output convs/projections (`zero_module`);
    randomize them so parity is non-trivial end-to-end."""
    with torch.no_grad():
        for _, p in module.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, std)


def test_unet_full_v1_config_parity(reference_path):
    """Reference `UNetModel` at the REAL v1-inference config (860M params)
    vs our UNet with `convert_sd_unet`-converted weights at [2,64,64,4],
    t=981, ctx [2,77,768]."""
    from ldm.modules.diffusionmodules.openaimodel import UNetModel

    torch.manual_seed(0)
    ref = UNetModel(
        image_size=32, in_channels=4, out_channels=4, model_channels=320,
        attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=768, use_checkpoint=False,
        legacy=False,
    ).eval()
    _randomize_zero_params(ref)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 64, 64).astype(np.float32)
    ctx = rng.randn(2, 77, 768).astype(np.float32)
    t = torch.full((2,), 981, dtype=torch.long)
    with torch.no_grad():
        expect = ref(
            torch.from_numpy(x), text_index=None, timesteps=t,
            context=torch.from_numpy(ctx), coef=[], bboxs_curr=[],
        ).numpy()

    cfg = UNetConfig()  # defaults ARE the v1 config
    from diffusion_spacetime_attn_tpu.models.unet import UNet

    unet = UNet(cfg)
    params = convert.convert_sd_unet(to_np(ref.state_dict()), prefix="")
    del ref
    got = unet.apply(
        {"params": params},
        jnp.array(np.transpose(x, (0, 2, 3, 1))),
        jnp.full((2,), 981, jnp.int32),
        jnp.array(ctx),
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, expect, atol=2e-4)


def test_vae_full_config_decode_512(reference_path):
    """Reference VAE decoder at the real f8 config (ch=128, mult (1,2,4,4)),
    z [1,64,64,4] → 512² decode parity, plus encoder moments at 256²."""
    from ldm.modules.diffusionmodules.model import Decoder, Encoder

    ddconfig = dict(
        double_z=True, z_channels=4, resolution=256, in_channels=3, out_ch=3,
        ch=128, ch_mult=[1, 2, 4, 4], num_res_blocks=2, attn_resolutions=[],
        dropout=0.0,
    )
    torch.manual_seed(1)
    ref_dec = Decoder(**ddconfig).eval()
    ref_enc = Encoder(**ddconfig).eval()
    post_quant = torch.nn.Conv2d(4, 4, 1)
    quant = torch.nn.Conv2d(8, 8, 1)

    rng = np.random.RandomState(1)
    z = rng.randn(1, 4, 64, 64).astype(np.float32)
    with torch.no_grad():
        expect = ref_dec(post_quant(torch.from_numpy(z))).numpy()

    sd = {f"decoder.{k}": v for k, v in ref_dec.state_dict().items()}
    sd.update({f"encoder.{k}": v for k, v in ref_enc.state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v for k, v in post_quant.state_dict().items()})
    sd.update({f"quant_conv.{k}": v for k, v in quant.state_dict().items()})

    cfg = VAEConfig()  # defaults ARE the v1 f8 config
    from diffusion_spacetime_attn_tpu.models.vae import AutoencoderKL

    vae = AutoencoderKL(cfg)
    params = convert.convert_sd_vae(to_np(sd), prefix="")
    got = vae.apply(
        {"params": params},
        jnp.array(np.transpose(z, (0, 2, 3, 1))),
        method=AutoencoderKL.decode,
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got.shape == (1, 3, 512, 512)
    np.testing.assert_allclose(got, expect, atol=2e-4)

    # encoder moments at 256² (training path: `autoencoder.py:324-328`)
    x = rng.randn(1, 3, 256, 256).astype(np.float32)
    with torch.no_grad():
        moments = quant(ref_enc(torch.from_numpy(x))).numpy()
    mean, _ = vae.apply(
        {"params": params},
        jnp.array(np.transpose(x, (0, 2, 3, 1))),
        method=AutoencoderKL.encode_moments,
    )
    got_m = np.transpose(np.asarray(mean), (0, 3, 1, 2))
    np.testing.assert_allclose(got_m, moments[:, :4], atol=2e-4)


def test_spacetime_controlled_attention_full_scale(reference_path):
    """THE method core at PRODUCTION dims: reference `SpatialTransformer`
    with objects (`attention.py:223-346`) at 320ch / 8 heads / d_head 40 /
    ctx 768 / 64×64 (4096 query tokens) / 4 objects vs our controlled
    SpatialTransformer with converted weights."""
    import torch as _t

    from ldm.modules.attention import SpatialTransformer as RefST

    rng = np.random.RandomState(11)
    B, N, L, ch, heads, hw, ctx_dim = 1, 4, 77, 320, 8, 64, 768

    uncond_emb = rng.randn(1, L, ctx_dim).astype(np.float32)
    locals_ = [rng.randn(1, L, ctx_dim).astype(np.float32) for _ in range(N)]
    _t.save(_t.from_numpy(uncond_emb), "uncond_fix_radius_0p2_g0.pt")
    for i, l in enumerate(locals_):
        _t.save(_t.from_numpy(l), f"c{i}_fix_radius_0p2_g0.pt")

    _t.manual_seed(11)
    st = RefST(in_channels=ch, n_heads=heads, d_head=ch // heads,
               depth=1, context_dim=ctx_dim).eval()
    _randomize_zero_params(st, std=0.05)
    st.transformer_blocks[0].uncond = _t.from_numpy(uncond_emb)

    x = rng.randn(2 * B, ch, hw, hw).astype(np.float32) * 0.5
    context = rng.randn(2 * B, L, ctx_dim).astype(np.float32)
    centers = np.array([[0.3, 0.45], [0.7, 0.6], [0.2, 0.8], [0.9, 0.1]],
                       np.float32)
    coef = _t.tensor([1.7, 0.6, 1.1, 0.3])
    with _t.no_grad():
        expect = st(
            _t.from_numpy(x), context=_t.from_numpy(context),
            time=981, text_index=None, coef=coef,
            bboxs_curr=[list(map(float, c)) for c in centers],
        ).numpy()

    from diffusion_spacetime_attn_tpu.models.layers import SpatialTransformer
    from diffusion_spacetime_attn_tpu.ops.attention import SpatialControl

    mine = SpatialTransformer(channels=ch, heads=heads, radius=0.2)
    params = convert._spatial_transformer(
        {f"m.{k}": v.float().numpy() for k, v in st.state_dict().items()}, "m"
    )
    control = SpatialControl(
        local_contexts=jnp.array(np.stack([l[0] for l in locals_]))[None],
        centers=jnp.array(centers)[None],
        coef=jnp.array(coef.numpy())[None],
        active=jnp.ones((B, N)),
    )
    got = mine.apply(
        {"params": params},
        jnp.array(np.transpose(x, (0, 2, 3, 1))),
        jnp.array(context),
        control,
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, expect, atol=5e-4)


def test_clip_text_vit_l_full_parity():
    """transformers CLIPTextModel at the REAL ViT-L/14 text config (12L/768H,
    vocab 49408, 77 tokens — `encoders/modules.py:137-162`) vs our tower."""
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModel

    hf_cfg = HFCfg(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    torch.manual_seed(3)
    hf = CLIPTextModel(hf_cfg).eval()
    rng = np.random.RandomState(3)
    tokens = np.concatenate(
        [np.full((2, 1), 49406), rng.randint(0, 49000, (2, 10)),
         np.full((2, 1), 49407), np.zeros((2, 65), np.int64)], axis=1
    ).astype(np.int64)
    with torch.no_grad():
        expect = hf(torch.from_numpy(tokens)).last_hidden_state.numpy()

    cfg = CLIPTextConfig()  # defaults ARE ViT-L/14 text
    from diffusion_spacetime_attn_tpu.models.clip import CLIPTextTower

    tower = CLIPTextTower(cfg)
    params = convert.convert_hf_clip_text(to_np(hf.state_dict()))
    hidden, _ = tower.apply({"params": params}, jnp.array(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(hidden), expect, atol=2e-4)


def test_full_checkpoint_ingestion_end_to_end(reference_path, tmp_path):
    """The REAL-WEIGHT story end to end: a CompVis-layout .ckpt at the full
    v1 config (reference UNet + VAE + HF CLIP-L state dicts under the
    `model.diffusion_model.* / first_stage_model.* /
    cond_stage_model.transformer.*` prefixes, like `sd-v1-4.ckpt`) →
    `load_stable_diffusion` → a 2-step 512² txt2img — exercising the exact
    loader/converter path users hit, not just the per-model converters."""
    from ldm.modules.diffusionmodules.model import Decoder, Encoder
    from ldm.modules.diffusionmodules.openaimodel import UNetModel
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModel

    torch.manual_seed(0)
    unet = UNetModel(
        image_size=32, in_channels=4, out_channels=4, model_channels=320,
        attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=768, use_checkpoint=False,
        legacy=False,
    )
    _randomize_zero_params(unet)
    ddconfig = dict(double_z=True, z_channels=4, resolution=256,
                    in_channels=3, out_ch=3, ch=128, ch_mult=[1, 2, 4, 4],
                    num_res_blocks=2, attn_resolutions=[], dropout=0.0)
    enc, dec = Encoder(**ddconfig), Decoder(**ddconfig)
    quant = torch.nn.Conv2d(8, 8, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)
    hf = CLIPTextModel(HFCfg(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77, hidden_act="quick_gelu"))

    state = {}
    state.update({f"model.diffusion_model.{k}": v
                  for k, v in unet.state_dict().items()})
    state.update({f"first_stage_model.encoder.{k}": v
                  for k, v in enc.state_dict().items()})
    state.update({f"first_stage_model.decoder.{k}": v
                  for k, v in dec.state_dict().items()})
    state.update({f"first_stage_model.quant_conv.{k}": v
                  for k, v in quant.state_dict().items()})
    state.update({f"first_stage_model.post_quant_conv.{k}": v
                  for k, v in post_quant.state_dict().items()})
    state.update({f"cond_stage_model.transformer.{k}": v
                  for k, v in hf.state_dict().items()})
    ckpt = tmp_path / "sd-like.ckpt"
    torch.save({"state_dict": state}, ckpt)
    del unet, enc, dec, hf, state

    import jax

    from diffusion_spacetime_attn_tpu.config import PipelineConfig
    from diffusion_spacetime_attn_tpu.ops.schedule import make_schedule
    from diffusion_spacetime_attn_tpu.utils.loader import load_stable_diffusion

    cfg = PipelineConfig()  # full v1 defaults
    sd = load_stable_diffusion(cfg, str(ckpt))
    import dataclasses

    sd = dataclasses.replace(sd, schedule=make_schedule(cfg.schedule, 2))
    tokens = jnp.array([[49406, 320, 2368, 49407] + [0] * 73], jnp.int32)
    cond = sd.encode_text(tokens)
    uncond = sd.encode_text(jnp.zeros((1, 77), jnp.int32))
    assert cond.shape == (1, 77, 768)
    img = sd.txt2img(cond, uncond, jax.random.PRNGKey(0), sampler="ddim")
    assert img.shape == (1, 512, 512, 3)
    assert np.isfinite(np.asarray(img)).all()
