"""Golden-parity tests: our flax models vs torch oracles with converted
random weights.

- CLIP text / RoBERTa: oracles from `transformers` (CPU).
- UNet / VAE: oracles are the *reference implementation itself* imported
  read-only from /root/reference at tiny scale (skipped if unavailable).
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusion_spacetime_attn_tpu.config import LayoutConfig, CLIPTextConfig, UNetConfig, VAEConfig
from diffusion_spacetime_attn_tpu.utils import convert

REF_SD = "/root/reference/attention_optimization/stable-diffusion"

ATOL = 2e-4


def to_np(sd):
    return {k: v.detach().float().numpy() for k, v in sd.items()}


def test_clip_text_parity_vs_transformers():
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModel

    hf_cfg = HFCfg(
        vocab_size=100, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=16,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPTextModel(hf_cfg).eval()
    tokens = np.array([[5, 17, 3, 99, 2, 1, 0, 4]], np.int64)
    with torch.no_grad():
        expect = hf(torch.from_numpy(tokens)).last_hidden_state.numpy()

    cfg = CLIPTextConfig(vocab_size=100, width=32, layers=2, heads=2, max_len=16)
    from diffusion_spacetime_attn_tpu.models.clip import CLIPTextTower

    tower = CLIPTextTower(cfg)
    params = convert.convert_hf_clip_text(to_np(hf.state_dict()))
    hidden, pooled = tower.apply({"params": params}, jnp.array(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(hidden), expect, atol=ATOL)
    # EOT pooling = hidden state at argmax token id
    np.testing.assert_allclose(
        np.asarray(pooled), expect[np.arange(1), tokens.argmax(-1)], atol=ATOL
    )


def test_roberta_parity_vs_transformers():
    from transformers import RobertaConfig, RobertaModel

    hf_cfg = RobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, pad_token_id=1, type_vocab_size=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = RobertaModel(hf_cfg, add_pooling_layer=False).eval()
    tokens = np.array([[0, 7, 23, 45, 9, 2, 1, 1]], np.int64)  # trailing pads
    with torch.no_grad():
        expect = hf(
            torch.from_numpy(tokens),
            attention_mask=torch.from_numpy((tokens != 1).astype(np.int64)),
        ).last_hidden_state.numpy()

    cfg = LayoutConfig(
        vocab_size=120, hidden=32, layers=2, heads=2, ffn_dim=64,
        max_positions=40, max_len=8,
    )
    from diffusion_spacetime_attn_tpu.models.layout.roberta import RobertaBackbone

    model = RobertaBackbone(cfg)
    params = convert.convert_hf_roberta(to_np(hf.state_dict()))
    got = np.asarray(model.apply({"params": params}, jnp.array(tokens, jnp.int32)))
    mask = tokens[0] != 1
    np.testing.assert_allclose(got[0, mask], expect[0, mask], atol=ATOL)


@pytest.fixture(scope="module")
def reference_path(tmp_path_factory):
    if not os.path.isdir(REF_SD):
        pytest.skip("reference checkout not available")
    # the reference BasicTransformerBlock torch.loads this file at __init__
    d = tmp_path_factory.mktemp("refcwd")
    torch.save(torch.zeros(1, 77, 768), d / "uncond_fix_radius_0p2_g0.pt")
    # the reference imports torchvision only for a debug helper; stub it
    import types

    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        tv.io = types.SimpleNamespace(write_png=lambda *a, **k: None)
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        sys.modules["torchvision"] = tv
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        oc.listconfig = lc
        sys.modules["omegaconf"] = oc
        sys.modules["omegaconf.listconfig"] = lc
    sys.path.insert(0, REF_SD)
    cwd = os.getcwd()
    os.chdir(d)
    yield d
    os.chdir(cwd)
    sys.path.remove(REF_SD)


def test_unet_parity_vs_reference(reference_path):
    """Full-architecture parity at tiny scale against the reference
    `UNetModel` (`ldm/modules/diffusionmodules/openaimodel.py:413-742`),
    vanilla path (no objects)."""
    from ldm.modules.diffusionmodules.openaimodel import UNetModel

    torch.manual_seed(0)
    ref = UNetModel(
        image_size=16, in_channels=4, out_channels=4, model_channels=32,
        attention_resolutions=[1, 2], num_res_blocks=1, channel_mult=[1, 2],
        num_heads=2, use_spatial_transformer=True, transformer_depth=1,
        context_dim=16, use_checkpoint=False, legacy=False,
    ).eval()
    # randomize zero-init convs so parity is non-trivial
    with torch.no_grad():
        for n, p in ref.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    ctx = rng.randn(2, 7, 16).astype(np.float32)
    t = torch.full((2,), 981, dtype=torch.long)
    with torch.no_grad():
        expect = ref(
            torch.from_numpy(x), text_index=None, timesteps=t,
            context=torch.from_numpy(ctx), coef=[], bboxs_curr=[],
        ).numpy()

    cfg = UNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(1, 2), num_heads=2, context_dim=16,
    )
    from diffusion_spacetime_attn_tpu.models.unet import UNet

    unet = UNet(cfg)
    params = convert.convert_sd_unet(
        to_np(ref.state_dict()), prefix="",
        channel_mult=(1, 2), num_res_blocks=1, attention_ds=(1, 2),
    )
    got = unet.apply(
        {"params": params},
        jnp.array(np.transpose(x, (0, 2, 3, 1))),
        jnp.full((2,), 981, jnp.int32),
        jnp.array(ctx),
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, expect, atol=5e-4)


def test_vae_decoder_parity_vs_reference(reference_path):
    """Decoder parity vs reference `ldm/modules/diffusionmodules/model.py`."""
    from ldm.modules.diffusionmodules.model import Decoder

    ddconfig = dict(
        double_z=True, z_channels=4, resolution=32, in_channels=3, out_ch=3,
        ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
        dropout=0.0,
    )
    torch.manual_seed(1)
    ref_dec = Decoder(**ddconfig).eval()
    post_quant = torch.nn.Conv2d(4, 4, 1)

    rng = np.random.RandomState(1)
    z = rng.randn(1, 4, 8, 8).astype(np.float32)
    with torch.no_grad():
        expect = ref_dec(post_quant(torch.from_numpy(z))).numpy()

    sd = {f"decoder.{k}": v for k, v in ref_dec.state_dict().items()}
    sd.update({f"post_quant_conv.{k}": v for k, v in post_quant.state_dict().items()})
    # encoder/quant_conv keys are required by the converter; synthesize from a
    # matching torch Encoder
    from ldm.modules.diffusionmodules.model import Encoder

    ref_enc = Encoder(**ddconfig).eval()
    sd.update({f"encoder.{k}": v for k, v in ref_enc.state_dict().items()})
    quant = torch.nn.Conv2d(8, 8, 1)
    sd.update({f"quant_conv.{k}": v for k, v in quant.state_dict().items()})

    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    from diffusion_spacetime_attn_tpu.models.vae import AutoencoderKL

    vae = AutoencoderKL(cfg)
    params = convert.convert_sd_vae(to_np(sd), prefix="", ch_mult=(1, 2), num_res_blocks=1)
    got = vae.apply(
        {"params": params},
        jnp.array(np.transpose(z, (0, 2, 3, 1))),
        method=AutoencoderKL.decode,
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, expect, atol=5e-4)

    # encoder parity too
    x = rng.randn(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        moments = quant(ref_enc(torch.from_numpy(x))).numpy()
    mean, logvar = vae.apply(
        {"params": params},
        jnp.array(np.transpose(x, (0, 2, 3, 1))),
        method=AutoencoderKL.encode_moments,
    )
    got_m = np.transpose(np.asarray(mean), (0, 3, 1, 2))
    np.testing.assert_allclose(got_m, moments[:, :4], atol=5e-4)


def test_clip_vision_parity_vs_transformers():
    from transformers import CLIPVisionConfig as HFVCfg, CLIPVisionModel

    hf_cfg = HFVCfg(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(2)
    hf = CLIPVisionModel(hf_cfg).eval()
    rng = np.random.RandomState(3)
    img = rng.rand(2, 28, 28, 3).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(np.transpose(img, (0, 3, 1, 2))))
        # pooler_output = post_layernorm(cls token)
        expect = out.pooler_output.numpy()

    from diffusion_spacetime_attn_tpu.config import CLIPVisionConfig
    from diffusion_spacetime_attn_tpu.models.clip import CLIPVisionTower

    cfg = CLIPVisionConfig(image_size=28, patch_size=14, width=32, layers=2, heads=2)
    tower = CLIPVisionTower(cfg)
    params = convert.convert_hf_clip_vision(to_np(hf.state_dict()))
    got = np.asarray(tower.apply({"params": params}, jnp.array(img)))
    np.testing.assert_allclose(got, expect, atol=2e-4)


def test_openai_qkv_split_matches_fused():
    """OpenAI checkpoints store fused in_proj; verify the split mapping by
    comparing against torch MultiheadAttention."""
    import torch.nn as tnn

    torch.manual_seed(4)
    width, heads, L = 16, 2, 6
    mha = tnn.MultiheadAttention(width, heads, batch_first=True).eval()
    x = torch.randn(1, L, width)
    with torch.no_grad():
        expect = mha(x, x, x, need_weights=False)[0].numpy()

    sd = {
        "m.attn.in_proj_weight": mha.in_proj_weight.detach().numpy(),
        "m.attn.in_proj_bias": mha.in_proj_bias.detach().numpy(),
        "m.attn.out_proj.weight": mha.out_proj.weight.detach().numpy(),
        "m.attn.out_proj.bias": mha.out_proj.bias.detach().numpy(),
        "m.ln_1.weight": np.ones(width, np.float32),
        "m.ln_1.bias": np.zeros(width, np.float32),
        "m.ln_2.weight": np.ones(width, np.float32),
        "m.ln_2.bias": np.zeros(width, np.float32),
        "m.mlp.c_fc.weight": np.zeros((width * 4, width), np.float32),
        "m.mlp.c_fc.bias": np.zeros(width * 4, np.float32),
        "m.mlp.c_proj.weight": np.zeros((width, width * 4), np.float32),
        "m.mlp.c_proj.bias": np.zeros(width, np.float32),
    }
    layer_params = convert._openai_layer(sd, "m")["attn"]
    from diffusion_spacetime_attn_tpu.models.clip import CLIPAttention

    attn = CLIPAttention(width, heads)
    got = np.asarray(
        attn.apply({"params": layer_params}, jnp.array(x.numpy()))
    )
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_spacetime_controlled_attention_parity_vs_reference(reference_path):
    """THE core-method oracle: reference `BasicTransformerBlock._forward`
    with objects (`attention.py:268-300`) vs our controlled SpatialTransformer
    with converted weights.  The reference loads local contexts from
    c{i}_fix_radius_0p2_g0.pt files and builds masks at time==981; we feed
    the same data as explicit SpatialControl operands."""
    from ldm.modules.attention import SpatialTransformer as RefST

    rng = np.random.RandomState(7)
    B, N, L, ch, heads, hw = 1, 2, 7, 32, 2, 8
    ctx_dim = 16

    # per-object local contexts — reference reads (uncond, local) pairs from
    # disk (attention.py:246-248)
    uncond_emb = rng.randn(1, L, ctx_dim).astype(np.float32)
    locals_ = [rng.randn(1, L, ctx_dim).astype(np.float32) for _ in range(N)]
    torch.save(torch.from_numpy(uncond_emb), "uncond_fix_radius_0p2_g0.pt")
    for i, l in enumerate(locals_):
        torch.save(torch.from_numpy(l), f"c{i}_fix_radius_0p2_g0.pt")

    torch.manual_seed(7)
    st = RefST(in_channels=ch, n_heads=heads, d_head=ch // heads,
               depth=1, context_dim=ctx_dim).eval()
    with torch.no_grad():
        for n, p in st.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.05)
    # module was constructed before our uncond file was (re)written; reload
    st.transformer_blocks[0].uncond = torch.from_numpy(uncond_emb)

    x = rng.randn(2 * B, ch, hw, hw).astype(np.float32)  # (uncond, cond)
    context = rng.randn(2 * B, L, ctx_dim).astype(np.float32)
    centers = np.array([[0.3, 0.45], [0.7, 0.6]], np.float32)
    coef = torch.tensor([1.7, 0.6])
    with torch.no_grad():
        expect = st(
            torch.from_numpy(x), context=torch.from_numpy(context),
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
        local_contexts=jnp.array(np.stack([l[0] for l in locals_]))[None],  # [B,N,L,D]
        centers=jnp.array(centers)[None],
        coef=jnp.array(coef.numpy())[None],
        active=jnp.ones((B, N)),
    )
    # our context convention: rows [0:B]=uncond, [B:2B]=cond — matches the
    # (uncond, cond) stacking of x and context above
    got = mine.apply(
        {"params": params},
        jnp.array(np.transpose(x, (0, 2, 3, 1))),
        jnp.array(context),
        control,
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, expect, atol=1e-4)
