"""Typed configuration for every component of the framework.

The reference hard-codes the method's hyperparameters as scattered constants
(`ldm/modules/attention.py:14,240,261`, `ldm/models/diffusion/plms.py:19,204-273`,
`scripts/txt2img-gpt.py:301`).  Here every one of them is a field of a frozen
dataclass so jitted functions can close over them as static values.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD v1 UNet (reference: `configs/stable-diffusion/v1-inference.yaml:30-44`,
    `ldm/modules/diffusionmodules/openaimodel.py:413-`)."""

    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    # downsample factors at which SpatialTransformers are inserted
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    num_heads: int = 8
    # if set, heads = channels // num_head_channels per level (the reference
    # `openaimodel.py:487-492` supports both; the RDM 768×768 model uses
    # num_head_channels=32 — `configs/retrieval-augmented-diffusion/768x768.yaml`)
    num_head_channels: Optional[int] = None
    transformer_depth: int = 1
    context_dim: int = 768
    dropout: float = 0.0
    # compute dtype name ("bfloat16" or "float32"); params stay float32
    dtype: str = "float32"
    # route long self-attention through the Pallas TPU flash kernel
    use_flash: bool = False
    # route self-attention through the fused full-softmax Pallas MHA kernel
    # (ops/pallas_mha.py): whole-K/V-in-VMEM, no online-softmax carries —
    # the serving-path speed knob at SD head geometries (use_flash wins when
    # both are set; the optimization chain needs splash's fused backward)
    use_mha: bool = False
    # fuse the blended global+local cross-attention into one Pallas kernel
    use_fused_control: bool = False
    # route winning-geometry GEGLU feed-forwards through the fused Pallas
    # MLP kernel (ops/pallas_geglu.py): both matmuls + erf-gelu gate +
    # residual in one pallas_call, gated intermediate stays in VMEM
    use_fused_ff: bool = False
    # materialize the GroupNorm+SiLU output before each ResBlock conv
    # (optimization_barrier) instead of letting XLA fuse the normalize
    # prologue into the conv.  REJECTED on v5e — measured 79.65 vs 80.29
    # img/min (docs/BENCHMARKS.md round 3: the fused emitter is already at
    # ~75% of the true FLOP floor); kept as an identity-safe probe knob
    # for other hardware generations
    conv_norm_barrier: bool = False
    # >0: compute long self-attention in query chunks of this size (identical
    # numerics, O(q_chunk·Lk) score memory instead of O(Lq·Lk)) — lifts the
    # level-0 [B,H,4096,4096] f32 score tensor that caps vanilla batch at 7
    attn_q_chunk: int = 0
    # dtype of the materialized self-attention score buffer ("float32" |
    # "bfloat16"): bf16 halves the level-0 [B,H,4096,4096] buffer without
    # serializing; softmax math stays f32 (fused casts)
    attn_scores_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL f=8 (reference: `v1-inference.yaml:46-68`,
    `ldm/models/autoencoder.py:285`, `ldm/modules/diffusionmodules/model.py`)."""

    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    out_ch: int = 3
    in_ch: int = 3
    scale_factor: float = 0.18215  # `v1-inference.yaml:17`
    # encoder/decoder feature-map resolutions that get an AttnBlock after each
    # resblock (reference ddconfig `attn_resolutions`; SD f8 uses none, the
    # RDM f16 VAE uses (16,)).  `resolution` is the nominal input size the
    # resolutions are counted from (reference `model.py` curr_res tracking).
    attn_resolutions: Tuple[int, ...] = ()
    resolution: int = 256
    dtype: str = "float32"
    # VQ variant (reference `VQModel`, `autoencoder.py:14-283`): codebook
    # size; 0 for the KL model.  VQ-f4/f8 first stages use 8192/16384.
    n_embed: int = 8192


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """CLIP text transformer.  Defaults = ViT-L/14 text tower used as the SD
    conditioning encoder (reference: `ldm/modules/encoders/modules.py:137-162`,
    transformers `openai/clip-vit-large-patch14`)."""

    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    max_len: int = 77
    dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """CLIP vision transformer.  Defaults = ViT-B/32 image tower used by the
    fidelity loss (reference: `ldm/models/diffusion/plms.py:24`)."""

    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    projection_dim: int = 512
    dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """A full dual-tower CLIP (ViT-B/32 by default) for the DCLIP loss
    (reference: `plms.py:21-61`)."""

    vision: CLIPVisionConfig = CLIPVisionConfig()
    text: CLIPTextConfig = CLIPTextConfig(width=512, heads=8, layers=12)
    projection_dim: int = 512


@dataclasses.dataclass(frozen=True)
class ScheduleConfig:
    """DDPM noise schedule (reference: `v1-inference.yaml:5-6`,
    `ldm/modules/diffusionmodules/util.py:21-25`)."""

    num_train_timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.0120
    schedule: str = "linear"  # sqrt-space linear, CompVis convention


@dataclasses.dataclass(frozen=True)
class SpaceTimeConfig:
    """The paper's method constants (reference: `plms.py:204-273`,
    `attention.py:240-294`, `scripts/txt2img-gpt.py:205-210`)."""

    num_steps: int = 50
    guidance_scale: float = 7.5
    radius: float = 0.2                 # circular region radius, normalized
    epochs: int = 3                     # Adam epochs over the full chain
    lr: float = 0.005                   # Adam lr on the blend weights
    init_coef: float = 5.0              # initial total weight, split over objects
    local_loss_weight: float = 5.0      # weight of each per-object CLIP loss
    crop_half: float = 0.2              # half-size of the per-object loss crop
    max_objects: int = 4                # static padding for object count
    image_size: int = 512
    latent_size: int = 64


@dataclasses.dataclass(frozen=True)
class LayoutConfig:
    """Layout predictor = RoBERTa-base encoder + object-position embedding +
    GMM bbox head (reference: `layout_predictor/LayoutTransformer/model/Model.py:1017-1034`,
    `model/bbox_head.py:46-306`)."""

    vocab_size: int = 50265
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    ffn_dim: int = 3072
    max_positions: int = 514
    pad_token_id: int = 1
    max_len: int = 128                  # BPE sequence length (`inference_coco.py:490`)
    gmm_components: int = 5             # `bbox_head.py:46`
    box_dim: int = 2                    # (x, y) centers only
    refine_layers: int = 2
    refine_heads: int = 2
    dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class LayoutTrainConfig:
    """Training hyperparameters (reference:
    `configs/coco/coco_seq2seq_v9_ablation_4.yaml:47-63`, `trainer/Pretrain.py`)."""

    batch_size: int = 64
    epochs: int = 100
    encoder_max_lr: float = 1e-6
    head_max_lr: float = 4e-5
    warmup_steps: int = 1000
    hold_steps: int = 2000
    decay_steps: int = 100000
    gmm_loss_weight: float = 0.1        # `Pretrain.py:262-266`
    hinge_margin: float = 0.2           # `loss.py:315-333`
    grad_clip_norm: float = 0.0         # 0 = off (reference has none);
                                        # >0 clips global grad norm so a
                                        # finite-but-huge step can't blow
                                        # params up to NaN mid-schedule
    checkpoint_every: int = 10          # epochs


@dataclasses.dataclass(frozen=True)
class LDMTrainConfig:
    """UNet (latent-diffusion) training hyperparameters (reference:
    `main.py:674-689` LR scaling, `ddpm.py:55-113` loss/EMA knobs,
    `ddpm.py:1379-1388` AdamW)."""

    batch_size: int = 4                  # per-device
    base_lr: float = 1e-4
    scale_lr: bool = True                # lr = accum × ndev × batch × base_lr
    accum_steps: int = 1                 # accumulate_grad_batches
    weight_decay: float = 1e-2           # reference uses bare torch AdamW
                                         # (`ddpm.py:1388`) whose default wd=1e-2
    grad_clip_norm: float = 0.0          # Lightning default: no clipping
    use_ema: bool = True                 # `ddpm.py:88-90`
    ema_decay: float = 0.9999            # LitEma default
    parameterization: str = "eps"        # "eps" | "x0"
    loss_type: str = "l2"                # `ddpm.py:279-292`
    l_simple_weight: float = 1.0
    original_elbo_weight: float = 0.0
    learn_logvar: bool = False
    logvar_init: float = 0.0
    # LR-multiplier schedule over the scaled lr (reference `main.py:691-701`
    # wraps the optimizer in a LambdaLR when the config has `scheduler_config`;
    # SD configs use LambdaLinearScheduler with warm_up_steps=[10000]).
    # "none" | "lambda_linear" | "warmup_cosine"
    lr_schedule: str = "none"
    lr_warmup_steps: int = 10000         # `configs/latent-diffusion/*: [10000]`
    lr_f_start: float = 1e-6
    lr_f_min: float = 1.0
    lr_f_max: float = 1.0
    lr_cycle_steps: int = 1_000_000_000  # effectively one unbounded cycle
                                         # (int32-safe; ~19k years at 1 step/s)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    unet: UNetConfig = UNetConfig()
    vae: VAEConfig = VAEConfig()
    text_encoder: CLIPTextConfig = CLIPTextConfig()
    loss_clip: CLIPConfig = CLIPConfig()
    schedule: ScheduleConfig = ScheduleConfig()
    spacetime: SpaceTimeConfig = SpaceTimeConfig()
