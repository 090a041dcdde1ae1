"""SD v1 UNet, NHWC, flax.linen.

Architecture parity with the reference
(`ldm/modules/diffusionmodules/openaimodel.py:413-742`, config
`configs/stable-diffusion/v1-inference.yaml:30-44`): 320 base channels,
mult (1,2,4,4), 2 res blocks per level, SpatialTransformer (depth 1,
8 heads, context 768) at downsample factors 1/2/4, middle block
Res→Transformer→Res, skip connections concatenated on the channel axis.

Differences by design (TPU-first):
  * NHWC layout (XLA:TPU native for convs).
  * The spatial-control state is an explicit `SpatialControl` operand threaded
    to every cross-attention — no module state, no file I/O, no t==981 trigger
    (cf. `attention.py:234-263`).
  * Both the vanilla path (control=None) and the controlled path share one
    forward — the reference's vanilla conditional path is broken
    (`ddpm.py:1005` vs `ddpm.py:1420`); here both are first-class.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import UNetConfig
from ..ops.attention import SpatialControl
from .layers import (
    Downsample,
    GroupNorm32,
    ResBlock,
    SpatialTransformer,
    Upsample,
    timestep_embedding,
)


class UNet(nn.Module):
    cfg: UNetConfig
    radius: float = 0.2

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,            # [B, H, W, C] latents (B = 2·prompts under CFG)
        timesteps: jnp.ndarray,    # [B] int32
        context: Optional[jnp.ndarray] = None,  # [B, L, D] conditioning; None = unconditional LDM
        control: Optional[SpatialControl] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        x = x.astype(dtype)
        if context is not None:
            context = context.astype(dtype)

        # time embedding: sinusoidal(320) → MLP → 1280
        t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(dtype)
        emb_dim = cfg.model_channels * 4
        emb = nn.Dense(emb_dim, dtype=dtype, name="time_embed_0")(t_emb)
        emb = nn.silu(emb)
        emb = nn.Dense(emb_dim, dtype=dtype, name="time_embed_2")(emb)

        def transformer(ch, name):
            # fixed head count (SD v1: num_heads=8) or fixed head width
            # (RDM: num_head_channels=32 → heads = ch // 32), matching
            # `openaimodel.py:487-492`
            heads = (ch // cfg.num_head_channels
                     if cfg.num_head_channels else cfg.num_heads)
            return SpatialTransformer(
                channels=ch,
                heads=heads,
                depth=cfg.transformer_depth,
                radius=self.radius,
                dtype=dtype,
                flash=cfg.use_flash,
                mha=cfg.use_mha,
                fused_control=cfg.use_fused_control,
                fused_ff=cfg.use_fused_ff,
                q_chunk=cfg.attn_q_chunk,
                scores_dtype=(None if cfg.attn_scores_dtype == "float32"
                              else jnp.dtype(cfg.attn_scores_dtype)),
                name=name,
            )

        hs = []
        h = nn.Conv(cfg.model_channels, (3, 3), dtype=dtype, name="in_conv")(x)
        hs.append(h)

        # ---- encoder ----
        ds = 1
        block_idx = 0
        num_levels = len(cfg.channel_mult)
        for level, mult in enumerate(cfg.channel_mult):
            ch = cfg.model_channels * mult
            for _ in range(cfg.num_res_blocks):
                h = ResBlock(ch, dtype=dtype, norm_barrier=cfg.conv_norm_barrier,
                             name=f"down_res_{block_idx}")(h, emb)
                if ds in cfg.attention_resolutions:
                    h = transformer(ch, f"down_attn_{block_idx}")(h, context, control)
                hs.append(h)
                block_idx += 1
            if level != num_levels - 1:
                h = Downsample(ch, dtype=dtype, name=f"down_sample_{level}")(h)
                hs.append(h)
                ds *= 2

        # ---- middle ----
        ch = cfg.model_channels * cfg.channel_mult[-1]
        h = ResBlock(ch, dtype=dtype, norm_barrier=cfg.conv_norm_barrier,
                     name="mid_res_0")(h, emb)
        h = transformer(ch, "mid_attn")(h, context, control)
        h = ResBlock(ch, dtype=dtype, norm_barrier=cfg.conv_norm_barrier,
                     name="mid_res_1")(h, emb)

        # ---- decoder ----
        block_idx = 0
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            ch = cfg.model_channels * mult
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResBlock(ch, dtype=dtype, norm_barrier=cfg.conv_norm_barrier,
                             name=f"up_res_{block_idx}")(h, emb)
                if ds in cfg.attention_resolutions:
                    h = transformer(ch, f"up_attn_{block_idx}")(h, context, control)
                if level > 0 and i == cfg.num_res_blocks:
                    h = Upsample(ch, dtype=dtype, name=f"up_sample_{level}")(h)
                    ds //= 2
                block_idx += 1

        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        h = nn.Conv(
            cfg.out_channels, (3, 3), kernel_init=nn.initializers.zeros,
            dtype=dtype, name="out_conv",
        )(h)
        return h.astype(jnp.float32)
