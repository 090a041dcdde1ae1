"""CLIP text + vision transformers (flax.linen), OpenAI-CLIP numerics.

Two uses, mirroring the reference:
  * `CLIPTextTower` (ViT-L/14 defaults) = the SD conditioning encoder
    (reference `ldm/modules/encoders/modules.py:137-162`, FrozenCLIPEmbedder:
    last_hidden_state after the final LayerNorm).
  * `CLIP` (ViT-B/32 defaults) = the dual-tower model behind the DCLIP
    fidelity loss (reference `plms.py:21-61`, OpenAI `clip.load("ViT-B/32")`).

Numerics rules kept for weight parity with the OpenAI/HF checkpoints:
quick-GELU activations, LayerNorm eps 1e-5 in float32, causal mask on the
text tower, EOT-position pooling (argmax of token ids), bias-free patch
embedding and projection heads.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPConfig, CLIPTextConfig, CLIPVisionConfig
from .layers import norm_f32


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPMLP(nn.Module):
    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="fc1")(x)
        h = quick_gelu(h)
        return nn.Dense(self.width, dtype=self.dtype, name="fc2")(h)


class CLIPAttention(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        B, L, _ = x.shape
        dh = self.width // self.heads
        q = nn.Dense(self.width, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.width, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.width, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(B, L, self.heads, dh)
        k = k.reshape(B, L, self.heads, dh)
        v = v.reshape(B, L, self.heads, dh)
        sim = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        # pin scores/output: under FSDP the out_proj kernel is feature-
        # sharded, so the chain-backward cotangent otherwise reaches these
        # softmax ops with mixed feature shardings GSPMD can only reconcile
        # by involuntary full rematerialization (seen in the pure-FSDP
        # spacetime dryrun through jvp(CLIP.encode_image)); identity when no
        # mesh is in context — see ops/attention.py for the same fix
        from ..ops.spmd import constrain

        sim = constrain(sim, "data", "model", None, None)
        sim = sim * (dh ** -0.5)
        if mask is not None:
            sim = sim + mask
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32)
        out = out.reshape(B, L, self.width).astype(x.dtype)
        out = constrain(out, "data", None, "model")
        return nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        ln1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")
        ln2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")
        x = x + CLIPAttention(self.width, self.heads, dtype=self.dtype, name="attn")(
            norm_f32(ln1, x), mask
        )
        x = x + CLIPMLP(self.width, dtype=self.dtype, name="mlp")(norm_f32(ln2, x))
        return x


class CLIPTextTower(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray):
        """token_ids: [B, L] int32 → (last_hidden [B, L, W], pooled [B, W])."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        B, L = token_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.width, dtype=dtype, name="token_embedding")(
            token_ids
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_len, cfg.width),
        )
        x = tok + pos[None, :L].astype(dtype)
        causal = jnp.triu(
            jnp.full((L, L), -jnp.inf, dtype=jnp.float32), k=1
        )[None, None]
        for i in range(cfg.layers):
            x = CLIPEncoderLayer(cfg.width, cfg.heads, dtype=dtype, name=f"layer_{i}")(
                x, causal
            )
        x = norm_f32(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final"), x
        )
        # EOT pooling: the EOT token has the highest id in the CLIP vocab
        eot = jnp.argmax(token_ids, axis=-1)
        pooled = x[jnp.arange(B), eot]
        return x.astype(jnp.float32), pooled.astype(jnp.float32)


class CLIPVisionTower(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray):
        """pixels: [B, H, W, 3] (CLIP-normalized) → pooled pre-projection [B, W]."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        B = pixels.shape[0]
        patches = nn.Conv(
            cfg.width,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            padding="VALID",
            dtype=dtype,
            name="patch_embedding",
        )(pixels.astype(dtype))
        n = (cfg.image_size // cfg.patch_size) ** 2
        patches = patches.reshape(B, n, cfg.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (cfg.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dtype), (B, 1, cfg.width)), patches], axis=1
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (n + 1, cfg.width)
        )
        x = x + pos[None].astype(dtype)
        x = norm_f32(nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre"), x)
        for i in range(cfg.layers):
            x = CLIPEncoderLayer(cfg.width, cfg.heads, dtype=dtype, name=f"layer_{i}")(x)
        x = norm_f32(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post"),
            x[:, 0],
        )
        return x.astype(jnp.float32)


class CLIP(nn.Module):
    """Dual-tower CLIP with projection heads (ViT-B/32 defaults)."""

    cfg: CLIPConfig

    def setup(self):
        self.vision = CLIPVisionTower(self.cfg.vision)
        self.text = CLIPTextTower(self.cfg.text)
        self.visual_projection = nn.Dense(
            self.cfg.projection_dim, use_bias=False, name="visual_projection"
        )
        self.text_projection = nn.Dense(
            self.cfg.projection_dim, use_bias=False, name="text_projection"
        )

    def encode_image(self, pixels):
        return self.visual_projection(self.vision(pixels))

    def encode_text(self, token_ids):
        _, pooled = self.text(token_ids)
        return self.text_projection(pooled)

    def __call__(self, pixels, token_ids):
        img = self.encode_image(pixels)
        txt = self.encode_text(token_ids)
        return img, txt


# CLIP image preprocessing constants (OpenAI)
# numpy on purpose: a module-level jnp.array initializes the default backend
# at import time (grabbing the TPU before scripts can force a platform)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def clip_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """images in [0,1], [..., H, W, 3] → CLIP-normalized."""
    return (images - CLIP_MEAN) / CLIP_STD


def cosine_similarity(a, b, eps: float = 1e-8):
    a = a / jnp.clip(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    b = b / jnp.clip(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return jnp.sum(a * b, axis=-1)
