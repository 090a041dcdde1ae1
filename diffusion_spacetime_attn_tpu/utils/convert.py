"""Weight converters: torch state_dicts → flax param pytrees.

Covers the four external checkpoints the reference consumes:
  * CompVis `sd-v1-4.ckpt` (UNet `model.diffusion_model.*`, VAE
    `first_stage_model.*`, CLIP text `cond_stage_model.transformer.*`) —
    loaded strict=False at `scripts/txt2img-gpt.py:55-72`.
  * HF CLIP text (transformers `CLIPTextModel`) — `encoders/modules.py:139`.
  * OpenAI CLIP ViT-B/32 (`clip.load`) — `plms.py:24`.
  * fairseq/HF RoBERTa-base for the layout predictor — `Model.py:1021`.

All functions take a flat {name: numpy array} dict (call `.numpy()` on
torch tensors first, or use `load_torch_checkpoint`).  Layout conventions:
torch Linear [out,in] → flax kernel [in,out]; torch Conv [O,I,kh,kw] →
flax [kh,kw,I,O]; norm weight → scale.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .ckpt/.pt/.safetensors file into numpy arrays (CPU)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.float().numpy() for k, v in obj.items() if hasattr(v, "numpy")}


def _dense(sd, name):
    out = {"kernel": sd[f"{name}.weight"].T}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _conv(sd, name):
    out = {"kernel": np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _norm(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


# --------------------------------------------------------------------------
# SD v1 UNet (CompVis `model.diffusion_model.*` → models.unet.UNet)
# --------------------------------------------------------------------------

def _res_block(sd, p):
    out = {
        "in_norm": {"GroupNorm_0": _norm(sd, f"{p}.in_layers.0")},
        "in_conv": _conv(sd, f"{p}.in_layers.2"),
        "emb_proj": _dense(sd, f"{p}.emb_layers.1"),
        "out_norm": {"GroupNorm_0": _norm(sd, f"{p}.out_layers.0")},
        "out_conv": _conv(sd, f"{p}.out_layers.3"),
    }
    if f"{p}.skip_connection.weight" in sd:
        out["skip"] = _conv(sd, f"{p}.skip_connection")
    return out


def _cross_attn(sd, p):
    return {
        "to_q": {"kernel": sd[f"{p}.to_q.weight"].T},
        "to_k": {"kernel": sd[f"{p}.to_k.weight"].T},
        "to_v": {"kernel": sd[f"{p}.to_v.weight"].T},
        "to_out": _dense(sd, f"{p}.to_out.0"),
    }


def _transformer_block(sd, p):
    return {
        "attn1": _cross_attn(sd, f"{p}.attn1"),
        "attn2": _cross_attn(sd, f"{p}.attn2"),
        "ff": {
            "proj_in": _dense(sd, f"{p}.ff.net.0.proj"),
            "proj_out": _dense(sd, f"{p}.ff.net.2"),
        },
        "norm1": _norm(sd, f"{p}.norm1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "norm3": _norm(sd, f"{p}.norm3"),
    }


def _spatial_transformer(sd, p, depth=1):
    out = {
        "norm": {"GroupNorm_0": _norm(sd, f"{p}.norm")},
        "proj_in": _conv(sd, f"{p}.proj_in"),
        "proj_out": _conv(sd, f"{p}.proj_out"),
    }
    for d in range(depth):
        out[f"block_{d}"] = _transformer_block(sd, f"{p}.transformer_blocks.{d}")
    return out


def convert_sd_unet(
    sd: Dict[str, np.ndarray],
    prefix: str = "model.diffusion_model.",
    channel_mult=(1, 2, 4, 4),
    num_res_blocks: int = 2,
    attention_ds=(1, 2, 4),
):
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params = {
        "time_embed_0": _dense(sd, "time_embed.0"),
        "time_embed_2": _dense(sd, "time_embed.2"),
        "in_conv": _conv(sd, "input_blocks.0.0"),
        "mid_res_0": _res_block(sd, "middle_block.0"),
        "mid_attn": _spatial_transformer(sd, "middle_block.1"),
        "mid_res_1": _res_block(sd, "middle_block.2"),
        "out_norm": {"GroupNorm_0": _norm(sd, "out.0")},
        "out_conv": _conv(sd, "out.2"),
    }
    # encoder
    idx, k, ds = 1, 0, 1
    num_levels = len(channel_mult)
    for level in range(num_levels):
        for _ in range(num_res_blocks):
            params[f"down_res_{k}"] = _res_block(sd, f"input_blocks.{idx}.0")
            if ds in attention_ds:
                params[f"down_attn_{k}"] = _spatial_transformer(
                    sd, f"input_blocks.{idx}.1"
                )
            idx += 1
            k += 1
        if level != num_levels - 1:
            params[f"down_sample_{level}"] = {
                "conv": _conv(sd, f"input_blocks.{idx}.0.op")
            }
            idx += 1
            ds *= 2
    # decoder
    idx, k = 0, 0
    for level in reversed(range(num_levels)):
        for i in range(num_res_blocks + 1):
            params[f"up_res_{k}"] = _res_block(sd, f"output_blocks.{idx}.0")
            op = 1
            if ds in attention_ds:
                params[f"up_attn_{k}"] = _spatial_transformer(
                    sd, f"output_blocks.{idx}.{op}"
                )
                op += 1
            if level > 0 and i == num_res_blocks:
                params[f"up_sample_{level}"] = {
                    "conv": _conv(sd, f"output_blocks.{idx}.{op}.conv")
                }
                ds //= 2
            idx += 1
            k += 1
    return params


# --------------------------------------------------------------------------
# VAE (CompVis `first_stage_model.*` → models.vae.AutoencoderKL)
# --------------------------------------------------------------------------

def _vae_res(sd, p):
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv(sd, f"{p}.nin_shortcut")
    return out


def _vae_attn(sd, p):
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "q": _conv(sd, f"{p}.q"),
        "k": _conv(sd, f"{p}.k"),
        "v": _conv(sd, f"{p}.v"),
        "proj_out": _conv(sd, f"{p}.proj_out"),
    }


def convert_sd_vae(
    sd: Dict[str, np.ndarray],
    prefix: str = "first_stage_model.",
    ch_mult=(1, 2, 4, 4),
    num_res_blocks: int = 2,
):
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    num_levels = len(ch_mult)
    enc = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "mid_block_1": _vae_res(sd, "encoder.mid.block_1"),
        "mid_attn_1": _vae_attn(sd, "encoder.mid.attn_1"),
        "mid_block_2": _vae_res(sd, "encoder.mid.block_2"),
        "norm_out": _norm(sd, "encoder.norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
    }
    for level in range(num_levels):
        for i in range(num_res_blocks):
            enc[f"down_{level}_block_{i}"] = _vae_res(
                sd, f"encoder.down.{level}.block.{i}"
            )
        if level != num_levels - 1:
            enc[f"down_{level}_downsample"] = _conv(
                sd, f"encoder.down.{level}.downsample.conv"
            )
    dec = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid_block_1": _vae_res(sd, "decoder.mid.block_1"),
        "mid_attn_1": _vae_attn(sd, "decoder.mid.attn_1"),
        "mid_block_2": _vae_res(sd, "decoder.mid.block_2"),
        "norm_out": _norm(sd, "decoder.norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }
    for level in range(num_levels):
        for i in range(num_res_blocks + 1):
            dec[f"up_{level}_block_{i}"] = _vae_res(sd, f"decoder.up.{level}.block.{i}")
        if level != 0:
            dec[f"up_{level}_upsample"] = _conv(sd, f"decoder.up.{level}.upsample.conv")
    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


def convert_sd_vq(
    sd: Dict[str, np.ndarray],
    prefix: str = "first_stage_model.",
    ch_mult=(1, 2, 4, 4),
    num_res_blocks: int = 2,
):
    """Reference `VQModel` state dict (`autoencoder.py:14-283`: the KL
    layout plus `quantize.embedding.weight` [n_embed, embed_dim]) →
    models.vae.VQModel params."""
    params = convert_sd_vae(sd, prefix=prefix, ch_mult=ch_mult,
                            num_res_blocks=num_res_blocks)
    stripped = {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}
    params["quantize"] = {"embedding": stripped["quantize.embedding.weight"]}
    return params


# --------------------------------------------------------------------------
# HF CLIP text model (transformers CLIPTextModel → models.clip.CLIPTextTower)
# --------------------------------------------------------------------------

def convert_hf_clip_text(sd: Dict[str, np.ndarray], prefix: str = "text_model."):
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params = {
        "token_embedding": {"embedding": sd["embeddings.token_embedding.weight"]},
        "position_embedding": sd["embeddings.position_embedding.weight"],
        "ln_final": _norm(sd, "final_layer_norm"),
    }
    i = 0
    while f"encoder.layers.{i}.layer_norm1.weight" in sd:
        p = f"encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "ln1": _norm(sd, f"{p}.layer_norm1"),
            "ln2": _norm(sd, f"{p}.layer_norm2"),
            "attn": {
                "q_proj": _dense(sd, f"{p}.self_attn.q_proj"),
                "k_proj": _dense(sd, f"{p}.self_attn.k_proj"),
                "v_proj": _dense(sd, f"{p}.self_attn.v_proj"),
                "out_proj": _dense(sd, f"{p}.self_attn.out_proj"),
            },
            "mlp": {
                "fc1": _dense(sd, f"{p}.mlp.fc1"),
                "fc2": _dense(sd, f"{p}.mlp.fc2"),
            },
        }
        i += 1
    return params


# --------------------------------------------------------------------------
# OpenAI CLIP (ViT-B/32 `clip.load` state_dict → models.clip.CLIP)
# --------------------------------------------------------------------------

def _openai_layer(sd, p):
    w = sd[f"{p}.attn.in_proj_weight"]
    b = sd[f"{p}.attn.in_proj_bias"]
    d = w.shape[0] // 3
    return {
        "ln1": _norm(sd, f"{p}.ln_1"),
        "ln2": _norm(sd, f"{p}.ln_2"),
        "attn": {
            "q_proj": {"kernel": w[:d].T, "bias": b[:d]},
            "k_proj": {"kernel": w[d : 2 * d].T, "bias": b[d : 2 * d]},
            "v_proj": {"kernel": w[2 * d :].T, "bias": b[2 * d :]},
            "out_proj": _dense(sd, f"{p}.attn.out_proj"),
        },
        "mlp": {
            "fc1": _dense(sd, f"{p}.mlp.c_fc"),
            "fc2": _dense(sd, f"{p}.mlp.c_proj"),
        },
    }


def convert_openai_clip(sd: Dict[str, np.ndarray]):
    vision = {
        "patch_embedding": {
            "kernel": np.transpose(sd["visual.conv1.weight"], (2, 3, 1, 0))
        },
        "class_embedding": sd["visual.class_embedding"],
        "position_embedding": sd["visual.positional_embedding"],
        "ln_pre": _norm(sd, "visual.ln_pre"),
        "ln_post": _norm(sd, "visual.ln_post"),
    }
    i = 0
    while f"visual.transformer.resblocks.{i}.ln_1.weight" in sd:
        vision[f"layer_{i}"] = _openai_layer(sd, f"visual.transformer.resblocks.{i}")
        i += 1
    text = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "position_embedding": sd["positional_embedding"],
        "ln_final": _norm(sd, "ln_final"),
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        text[f"layer_{i}"] = _openai_layer(sd, f"transformer.resblocks.{i}")
        i += 1
    return {
        "vision": vision,
        "text": text,
        # OpenAI stores projections as [in, out] matrices already
        "visual_projection": {"kernel": sd["visual.proj"]},
        "text_projection": {"kernel": sd["text_projection"]},
    }


def convert_hf_clip_vision(sd: Dict[str, np.ndarray], prefix: str = "vision_model."):
    """transformers CLIPVisionModel → models.clip.CLIPVisionTower params."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params = {
        "patch_embedding": {
            "kernel": np.transpose(sd["embeddings.patch_embedding.weight"], (2, 3, 1, 0))
        },
        "class_embedding": sd["embeddings.class_embedding"],
        "position_embedding": sd["embeddings.position_embedding.weight"],
        "ln_pre": _norm(sd, "pre_layrnorm"),   # (sic) HF key spelling
        "ln_post": _norm(sd, "post_layernorm"),
    }
    i = 0
    while f"encoder.layers.{i}.layer_norm1.weight" in sd:
        p = f"encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "ln1": _norm(sd, f"{p}.layer_norm1"),
            "ln2": _norm(sd, f"{p}.layer_norm2"),
            "attn": {
                "q_proj": _dense(sd, f"{p}.self_attn.q_proj"),
                "k_proj": _dense(sd, f"{p}.self_attn.k_proj"),
                "v_proj": _dense(sd, f"{p}.self_attn.v_proj"),
                "out_proj": _dense(sd, f"{p}.self_attn.out_proj"),
            },
            "mlp": {
                "fc1": _dense(sd, f"{p}.mlp.fc1"),
                "fc2": _dense(sd, f"{p}.mlp.fc2"),
            },
        }
        i += 1
    return params


# --------------------------------------------------------------------------
# HF RoBERTa (transformers RobertaModel → models.layout.roberta.RobertaBackbone)
# --------------------------------------------------------------------------

def convert_hf_roberta(sd: Dict[str, np.ndarray], prefix: str = ""):
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    pos = sd["embeddings.position_embeddings.weight"]
    # HF adds a constant token_type(0) embedding everywhere; fold it into the
    # position table (our backbone has no token_type input)
    if "embeddings.token_type_embeddings.weight" in sd:
        pos = pos + sd["embeddings.token_type_embeddings.weight"][0]
    params = {
        "token_embedding": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embedding": {"embedding": pos},
        "emb_ln": _norm(sd, "embeddings.LayerNorm"),
    }
    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in sd:
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attn": {
                "q": _dense(sd, f"{p}.attention.self.query"),
                "k": _dense(sd, f"{p}.attention.self.key"),
                "v": _dense(sd, f"{p}.attention.self.value"),
                "out": _dense(sd, f"{p}.attention.output.dense"),
            },
            "attn_ln": _norm(sd, f"{p}.attention.output.LayerNorm"),
            "fc1": _dense(sd, f"{p}.intermediate.dense"),
            "fc2": _dense(sd, f"{p}.output.dense"),
            "final_ln": _norm(sd, f"{p}.output.LayerNorm"),
        }
        i += 1
    return params


# --------------------------------------------------------------------------
# fairseq Rel2Bbox layout checkpoint (`checkpoint_90_0.0.pth`) →
# models.layout.model.LayoutPredictor
# --------------------------------------------------------------------------

def convert_fairseq_rel2bbox(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference `Rel2Bbox` state dict → full LayoutPredictor pytree.

    The reference model (`model/Model.py:1017-1034`) is a torch.hub RoBERTa
    whose encoder is replaced by the custom `RobertaEncoder`
    (`Model.py:533-628`), so the checkpoint pinned by inference
    (`inference_coco.py:467-477`) carries fairseq naming:

      encoder[.model].encoder.sentence_encoder.embed_tokens.weight
      encoder[.model].encoder.sentence_encoder.embed_positions.weight
      encoder[.model].encoder.sentence_encoder.layernorm_embedding.*
      encoder[.model].encoder.sentence_encoder.object_embedding   (`Model.py:73-74`)
      encoder[.model].encoder.sentence_encoder.layers.{i}.self_attn.{q,k,v,out}_proj.*
      encoder[.model].encoder.sentence_encoder.layers.{i}.{self_attn_layer_norm,
                                                           fc1,fc2,final_layer_norm}.*
      bbox_head.Decoder.output_Layer.*                 (`bbox_head.py:241-242`)
      bbox_head.Decoder.box_predictor.xy_bivariate.*   (`bbox_head.py:54`)

    Dead modules (lm_head, the never-invoked CustomTransformerDecoder,
    refine_encoder/refine_box_head — see `PDFDecoder.forward`,
    `bbox_head.py:263-267`) are ignored.

    fairseq conventions that line up with our backbone without remapping:
    learned positions are indexed `padding_idx + cumsum(mask)` on both sides
    (fairseq `utils.make_positions` ≡ our RobertaBackbone), and
    `no_scale_embedding=True` for RoBERTa so embed_scale is 1.
    """
    # normalize the backbone prefix: accept any nesting down to
    # `sentence_encoder.*`
    enc = {}
    for k, v in sd.items():
        pos = k.find("sentence_encoder.")
        if pos >= 0:
            enc[k[pos + len("sentence_encoder."):]] = v
    if not enc:
        raise ValueError("no sentence_encoder.* keys — not a fairseq "
                         "Rel2Bbox checkpoint")

    backbone = {
        "token_embedding": {"embedding": enc["embed_tokens.weight"]},
        "position_embedding": {"embedding": enc["embed_positions.weight"]},
        "emb_ln": _norm(enc, "layernorm_embedding"),
        "object_embedding": enc["object_embedding"].reshape(1, -1),
    }
    i = 0
    while f"layers.{i}.self_attn.q_proj.weight" in enc:
        p = f"layers.{i}"
        backbone[f"layer_{i}"] = {
            "attn": {
                "q": _dense(enc, f"{p}.self_attn.q_proj"),
                "k": _dense(enc, f"{p}.self_attn.k_proj"),
                "v": _dense(enc, f"{p}.self_attn.v_proj"),
                "out": _dense(enc, f"{p}.self_attn.out_proj"),
            },
            "attn_ln": _norm(enc, f"{p}.self_attn_layer_norm"),
            "fc1": _dense(enc, f"{p}.fc1"),
            "fc2": _dense(enc, f"{p}.fc2"),
            "final_ln": _norm(enc, f"{p}.final_layer_norm"),
        }
        i += 1

    head_prefix = None
    for cand in ("bbox_head.Decoder.", "Decoder."):
        if f"{cand}output_Layer.weight" in sd:
            head_prefix = cand
            break
    if head_prefix is None:
        raise ValueError("no bbox_head.Decoder.output_Layer.* keys")
    head = {
        "output_layer": _dense(sd, f"{head_prefix}output_Layer"),
        "xy_bivariate": _dense(sd, f"{head_prefix}box_predictor.xy_bivariate"),
    }
    return {"backbone": backbone, "head": head}


def load_fairseq_dictionary(path: str) -> Dict[int, int]:
    """`configs/test-dictionary.pkl` (a pickled fairseq `Dictionary`) →
    {gpt2_bpe_id: fairseq_index}.

    fairseq RoBERTa's dictionary symbols are, after the 4 specials
    (<s>=0, <pad>=1, </s>=2, <unk>=3), the GPT-2 byte-BPE token *ids as
    strings* in corpus-frequency order (`Model.py:540-542` loads it;
    `roberta.encode` at `inference_coco.py:489-492` emits these indices).
    Unpickled WITHOUT fairseq via a stub class loader — only the plain
    `symbols` list is needed.
    """
    import io
    import pickle

    class _StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except Exception:
                return type(name, (), {})

    with open(path, "rb") as f:
        obj = _StubUnpickler(io.BytesIO(f.read())).load()
    symbols = obj.symbols if hasattr(obj, "symbols") else obj["symbols"]
    mapping: Dict[int, int] = {}
    for idx, sym in enumerate(symbols):
        if sym.lstrip("-").isdigit():
            mapping[int(sym)] = idx
    return mapping


# torchvision VGG16 `features` conv indices, in order (pools at 4,9,16,23,30)
_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG16_SLICE_OF = {0: 1, 2: 1, 5: 2, 7: 2, 10: 3, 12: 3, 14: 3,
                   17: 4, 19: 4, 21: 4, 24: 5, 26: 5, 28: 5}


def convert_lpips(sd: Dict[str, np.ndarray]):
    """taming-transformers LPIPS checkpoint (`taming/modules/lpips.py` —
    `net.sliceK.<i>.weight` VGG16 convs with torchvision feature indices
    preserved, `lin{j}.model.1.weight` 1×1 heads) → `training.perceptual.LPIPS`
    params.  The fixed scaling-layer constants are compiled into the module."""
    vgg = {}
    for j, i in enumerate(_VGG16_CONV_IDX):
        k = f"net.slice{_VGG16_SLICE_OF[i]}.{i}"
        vgg[f"conv_{j}"] = {
            "kernel": np.transpose(np.asarray(sd[f"{k}.weight"]), (2, 3, 1, 0)),
            "bias": np.asarray(sd[f"{k}.bias"]),
        }
    params = {"vgg": vgg}
    for j in range(5):
        w = np.asarray(sd[f"lin{j}.model.1.weight"])  # [1, C, 1, 1]
        params[f"lin_{j}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    return params
