"""End-to-end tests for the one-command real-weights drill
(`scripts/ingest_weights.py`): convert -> vanilla image + optimized image +
CLIP-score JSON, the packaged form of the reference flow
`scripts/txt2img-gpt.py:55-72,263-272`.

Tiny-config test runs in the fast suite; the full-scale test synthesizes a
CompVis-layout checkpoint at the real v1 config (like
`test_parity_fullscale.py`) plus a fairseq-naming layout checkpoint at
RoBERTa-base scale and drives the CLI core through both loaders.
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from diffusion_spacetime_attn_tpu.config import (
    CLIPConfig,
    CLIPTextConfig,
    LayoutConfig,
    PipelineConfig,
    CLIPVisionConfig,
    SpaceTimeConfig,
    UNetConfig,
    VAEConfig,
)

from test_parity import reference_path  # noqa: F401  (fixture)

PROMPT = "a black cat sitting on a desk next to a laptop"


def _hash_tokenize(max_len, vocab):
    def tok(text):
        ids = [1] + [2 + (abs(hash(w)) % (vocab - 2))
                     for w in text.split()[: max_len - 2]] + [1]
        return np.asarray(ids + [0] * (max_len - len(ids)), np.int32)

    return tok


def _tiny_pipeline_cfg():
    # 32*7/16 = 14 -> loss-CLIP image size 14 (same geometry as
    # test_spacetime.py).
    return PipelineConfig(
        unet=UNetConfig(
            model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
            attention_resolutions=(1, 2), num_heads=2, context_dim=16,
        ),
        vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
        text_encoder=CLIPTextConfig(
            width=16, layers=2, heads=2, vocab_size=100, max_len=7
        ),
        loss_clip=CLIPConfig(
            vision=CLIPVisionConfig(
                image_size=14, patch_size=7, width=16, layers=2, heads=2,
                projection_dim=8,
            ),
            text=CLIPTextConfig(
                width=16, layers=2, heads=2, vocab_size=100, max_len=7
            ),
            projection_dim=8,
        ),
        spacetime=SpaceTimeConfig(
            num_steps=4, latent_size=16, image_size=32, max_objects=2,
        ),
    )


def test_drill_tiny_vanilla_and_layout_skip(tmp_path):
    """Fast path: vanilla image + CLIP JSON; layout max_len shorter than
    the prompt -> method is skipped and RECORDED as skipped (the drill's
    failure-detection contract), vanilla still delivered."""
    from ingest_weights import run_drill

    report = run_drill(
        prompt=PROMPT,
        outdir=str(tmp_path / "out"),
        steps=4,
        epochs=1,
        sampler="ddim",
        dtype="float32",
        flash=False,
        pipeline_cfg=_tiny_pipeline_cfg(),
        layout_cfg=LayoutConfig(
            vocab_size=120, hidden=32, layers=2, heads=2, ffn_dim=64,
            max_positions=40, max_len=8,  # < prompt word count -> no layout
        ),
        tokenize_fn=_hash_tokenize(7, 100),
    )
    assert report["sd_weights"] == "random"
    assert np.isfinite(report["vanilla_clip_score"])
    assert report["method_clip_score"] is None
    assert "layout" in report["method_skipped"]
    vanilla_pngs = os.listdir(tmp_path / "out" / "vanilla")
    assert any(p.endswith(".png") for p in vanilla_pngs)
    with open(tmp_path / "out" / "clip_scores.json") as f:
        assert json.load(f) == report


@pytest.mark.slow
def test_drill_tiny_end_to_end(tmp_path):
    from ingest_weights import run_drill

    report = run_drill(
        prompt=PROMPT,
        outdir=str(tmp_path / "out"),
        steps=4,
        epochs=1,
        sampler="ddim",
        dtype="float32",
        flash=False,
        pipeline_cfg=_tiny_pipeline_cfg(),
        layout_cfg=LayoutConfig(
            vocab_size=120, hidden=32, layers=2, heads=2, ffn_dim=64,
            max_positions=40, max_len=24,  # >= prompt word count
        ),
        tokenize_fn=_hash_tokenize(7, 100),
    )
    assert report["sd_weights"] == "random"  # no ckpt -> flagged
    assert np.isfinite(report["vanilla_clip_score"])
    assert np.isfinite(report["method_clip_score"])
    with open(tmp_path / "out" / "clip_scores.json") as f:
        assert json.load(f) == report
    vanilla_pngs = os.listdir(tmp_path / "out" / "vanilla")
    assert any(p.endswith(".png") for p in vanilla_pngs)
    method_pngs = os.listdir(tmp_path / "out" / "method")
    assert any(p.endswith(".png") for p in method_pngs)


@pytest.mark.slow
def test_drill_fullscale_checkpoints(reference_path, tmp_path):
    """The real-weights rehearsal: both checkpoints synthesized at
    PRODUCTION config/naming, ingested through the exact CLI path."""
    import torch
    from ldm.modules.diffusionmodules.model import Decoder, Encoder
    from ldm.modules.diffusionmodules.openaimodel import UNetModel
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModel
    from transformers import RobertaConfig, RobertaModel

    from test_fairseq_convert import _add_head, _fairseq_sd_from_hf

    torch.manual_seed(0)
    unet = UNetModel(
        image_size=32, in_channels=4, out_channels=4, model_channels=320,
        attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=768, use_checkpoint=False,
        legacy=False,
    )
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
    sd_ckpt = tmp_path / "sd-v1-like.ckpt"
    torch.save({"state_dict": state}, sd_ckpt)
    del unet, enc, dec, hf, state

    # fairseq Rel2Bbox checkpoint at base scale (naming per Model.py:533-628)
    roberta = RobertaModel(RobertaConfig())  # base: 12L/768
    hf_sd = {k: v.numpy() for k, v in roberta.state_dict().items()}
    fs = _add_head(_fairseq_sd_from_hf(hf_sd, 12, 768), 768)
    layout_ckpt = tmp_path / "checkpoint_90_0.0.pth"
    torch.save(
        {"state_dict": {k: torch.as_tensor(np.asarray(v))
                        for k, v in fs.items()},
         "log": {}, "n_steps": 0},
        layout_ckpt,
    )
    del roberta, hf_sd, fs

    from ingest_weights import run_drill

    report = run_drill(
        sd_ckpt=str(sd_ckpt),
        layout_ckpt=str(layout_ckpt),
        prompt=PROMPT,
        outdir=str(tmp_path / "out"),
        steps=2,
        epochs=1,
        sampler="ddim",
        dtype="float32",
        flash=False,
    )
    assert report["sd_weights"] == "checkpoint"
    assert report["layout_weights"] == "checkpoint"
    assert np.isfinite(report["vanilla_clip_score"])
    assert os.path.exists(tmp_path / "out" / "clip_scores.json")
