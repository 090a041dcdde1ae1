"""load_stable_diffusion: one CompVis-style .ckpt → full working bundle."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from diffusion_spacetime_attn_tpu.config import (
    CLIPTextConfig,
    PipelineConfig,
    SpaceTimeConfig,
    UNetConfig,
    VAEConfig,
)
from diffusion_spacetime_attn_tpu.utils.loader import load_stable_diffusion

TINY = PipelineConfig(
    unet=UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                    attention_resolutions=(1, 2), num_heads=2, context_dim=16),
    vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
    text_encoder=CLIPTextConfig(vocab_size=100, width=16, layers=1, heads=2, max_len=8),
    spacetime=SpaceTimeConfig(num_steps=4, latent_size=8, image_size=16),
)

REF_SD = "/root/reference/attention_optimization/stable-diffusion"


@pytest.mark.skipif(
    not __import__("os").path.isdir(REF_SD), reason="reference absent"
)
def test_checkpoint_roundtrip(tmp_path, monkeypatch):
    """Build a CompVis-layout state_dict from the reference torch modules +
    a HF CLIPText, save as .ckpt, load through load_stable_diffusion, and
    run the full txt2img path."""
    import sys, types

    # reference import shims (as in test_parity)
    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        tv.io = types.SimpleNamespace(write_png=lambda *a, **k: None)
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        sys.modules["torchvision"] = tv
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")
        lc.ListConfig = list
        oc.listconfig = lc
        sys.modules["omegaconf"] = oc
        sys.modules["omegaconf.listconfig"] = lc
    sys.path.insert(0, REF_SD)
    torch.save(torch.zeros(1, 77, 768), tmp_path / "uncond_fix_radius_0p2_g0.pt")
    monkeypatch.chdir(tmp_path)
    try:
        from ldm.modules.diffusionmodules.openaimodel import UNetModel
        from ldm.modules.diffusionmodules.model import Decoder, Encoder
        from transformers import CLIPTextConfig as HFCfg, CLIPTextModel

        torch.manual_seed(0)
        unet = UNetModel(
            image_size=8, in_channels=4, out_channels=4, model_channels=32,
            attention_resolutions=[1, 2], num_res_blocks=1, channel_mult=[1, 2],
            num_heads=2, use_spatial_transformer=True, transformer_depth=1,
            context_dim=16, use_checkpoint=False, legacy=False,
        )
        with torch.no_grad():
            for _, p in unet.named_parameters():
                if p.abs().sum() == 0:
                    p.normal_(0, 0.02)
        dd = dict(double_z=True, z_channels=4, resolution=16, in_channels=3,
                  out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
                  attn_resolutions=[], dropout=0.0)
        enc, dec = Encoder(**dd), Decoder(**dd)
        quant, post_quant = torch.nn.Conv2d(8, 8, 1), torch.nn.Conv2d(4, 4, 1)
        hf_text = CLIPTextModel(HFCfg(
            vocab_size=100, hidden_size=16, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=2,
            max_position_embeddings=8, hidden_act="quick_gelu",
        ))

        state = {}
        state.update({f"model.diffusion_model.{k}": v for k, v in unet.state_dict().items()})
        state.update({f"first_stage_model.encoder.{k}": v for k, v in enc.state_dict().items()})
        state.update({f"first_stage_model.decoder.{k}": v for k, v in dec.state_dict().items()})
        state.update({f"first_stage_model.quant_conv.{k}": v for k, v in quant.state_dict().items()})
        state.update({f"first_stage_model.post_quant_conv.{k}": v for k, v in post_quant.state_dict().items()})
        state.update({f"cond_stage_model.transformer.{k}": v for k, v in hf_text.state_dict().items()})
        ckpt = tmp_path / "sd-tiny.ckpt"
        torch.save({"state_dict": state}, ckpt)

        sd = load_stable_diffusion(TINY, str(ckpt))
        tokens = jnp.array([[5, 17, 3, 99, 2, 1, 0, 4]], jnp.int32)
        cond = sd.encode_text(tokens)
        # text parity against the HF model directly
        with torch.no_grad():
            expect = hf_text(torch.tensor([[5, 17, 3, 99, 2, 1, 0, 4]])).last_hidden_state.numpy()
        np.testing.assert_allclose(np.asarray(cond), expect, atol=2e-4)

        # end-to-end txt2img runs with loaded weights
        uncond = sd.encode_text(jnp.array([[1, 2, 0, 0, 0, 0, 0, 99]], jnp.int32))
        img = sd.txt2img(cond, uncond, jax.random.PRNGKey(0), sampler="ddim")
        assert img.shape == (1, 16, 16, 3)
        assert np.isfinite(np.asarray(img)).all()
    finally:
        sys.path.remove(REF_SD)


def test_image_paths_dataset_lsun_semantics(tmp_path):
    """`ldm/data/lsun.py` LSUNBase: txt split + center-crop + resize +
    [-1,1] scaling; ImageNet tree loader labels by sorted synset."""
    from PIL import Image

    from diffusion_spacetime_attn_tpu.training.image_data import (
        ImagePathsDataset,
        imagenet_tree,
        load_image,
        lsun_split,
    )

    # non-square image: 40x20 → center crop 20 → resize 16
    arr = np.zeros((20, 40, 3), np.uint8)
    arr[:, 10:30] = 255  # the center crop region is all-white
    p = tmp_path / "img.png"
    Image.fromarray(arr).save(p)
    out = load_image(str(p), 16)
    assert out.shape == (16, 16, 3)
    assert out.min() == 255  # crop kept only the white center

    (tmp_path / "split.txt").write_text("img.png\nimg.png\n")
    ds = lsun_split(str(tmp_path / "split.txt"), str(tmp_path), size=16,
                    flip_p=0.0)
    assert len(ds) == 2
    ex = ds[0]
    assert ex["image"].shape == (16, 16, 3)
    assert ex["image"].dtype == np.float32
    np.testing.assert_allclose(ex["image"].max(), 1.0)  # 255 → +1.0
    assert ex["relative_file_path_"] == "img.png"

    # batches: fixed shape, tail dropped
    b = next(ds.batches(2, epochs=1))
    assert b[0].shape == (2, 16, 16, 3) and b[1] is None

    # imagenet tree: class ids by sorted synset
    for syn, color in [("n02", 10), ("n01", 200)]:
        d = tmp_path / "tree" / syn
        d.mkdir(parents=True)
        Image.fromarray(np.full((8, 8, 3), color, np.uint8)).save(d / "a.JPEG")
    tree = imagenet_tree(str(tmp_path / "tree"), size=8, flip_p=0.0)
    assert tree.labels == [0, 1]  # n01 sorts before n02
    imgs, labels = next(tree.batches(2, epochs=1))
    assert imgs.shape == (2, 8, 8, 3)
    assert set(labels.tolist()) == {0, 1}

    # flip determinism: flip_p=1 mirrors
    ds_flip = ImagePathsDataset(paths=[str(p)], size=16, flip_p=1.0)
    ds_noflip = ImagePathsDataset(paths=[str(p)], size=16, flip_p=0.0)
    np.testing.assert_allclose(ds_flip[0]["image"],
                               ds_noflip[0]["image"][:, ::-1])


def test_cast_params_floating_leaves_only():
    """cast_params (the serving HBM saver, docs/SERVING.md): floating
    leaves cast, integer leaves untouched, already-narrow leaves pass
    through."""
    import jax.numpy as jnp

    from diffusion_spacetime_attn_tpu.utils.loader import cast_params

    tree = {"w": jnp.ones((4, 4), jnp.float32),
            "ids": jnp.arange(3, dtype=jnp.int32),
            "half": jnp.ones((2,), jnp.bfloat16)}
    out = cast_params(tree, "bfloat16")
    assert out["w"].dtype == jnp.bfloat16
    assert out["ids"].dtype == jnp.int32
    assert out["half"].dtype == jnp.bfloat16
