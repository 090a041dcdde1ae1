"""CLIP fidelity losses (the reference's DCLIPLoss, `plms.py:21-61`).

Global path (`forward_2`): nearest-upsample ×7 then 16×16 average-pool
(512·7/16 = 224).  That composite is a *linear* resize; here it is two exact
[224, 512] matmuls (separable), which is both bit-faithful to the reference
and MXU-friendly — no 3584² intermediate.

Local path (`forward_3`): per-object crop around the predicted center,
bilinear-resized to 224 (torchvision Resize, no antialias).  The reference
crops a variable-size region clamped at image borders; variable shapes don't
jit, so we crop a fixed-size window whose origin is clamped instead
(identical away from borders; see ops.masks.crop_window).

Note: the reference feeds images in [0,1] to CLIP *without* the CLIP
mean/std normalization — we reproduce that (normalize=False default) and
expose the flag.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import CLIP, clip_normalize, cosine_similarity
from ..ops.masks import crop_window, dynamic_crop


@functools.lru_cache(maxsize=8)
def _upsample_avgpool_matrix(src: int, up: int, pool: int) -> np.ndarray:
    """W[j, i] = count{m in [pool*j, pool*j+pool) : m // up == i} / pool."""
    dst = src * up // pool
    w = np.zeros((dst, src), np.float32)
    for j in range(dst):
        for m in range(pool * j, pool * j + pool):
            w[j, m // up] += 1.0 / pool
    return w


def global_resize(images: jnp.ndarray, up: int = 7, pool: int = 16) -> jnp.ndarray:
    """[B, S, S, C] → [B, S*up/pool, S*up/pool, C], exact ×up-nearest +
    pool-avgpool composite as two matmuls."""
    src = images.shape[1]
    w = jnp.asarray(_upsample_avgpool_matrix(src, up, pool))
    out = jnp.einsum("js,bshc->bjhc", w, images)
    out = jnp.einsum("kh,bjhc->bjkc", w, out)
    return out


@functools.lru_cache(maxsize=8)
def _bilinear_matrix(src: int, dst: int) -> np.ndarray:
    """Non-antialiased half-pixel bilinear weights (torch
    `interpolate(mode='bilinear', align_corners=False)`; jax.image.resize
    antialiases on downscale, so it can't be used for parity)."""
    w = np.zeros((dst, src), np.float32)
    scale = src / dst
    for j in range(dst):
        x = (j + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        frac = x - x0
        lo = min(max(x0, 0), src - 1)
        hi = min(max(x0 + 1, 0), src - 1)
        w[j, lo] += 1.0 - frac
        w[j, hi] += frac
    return w


def bilinear_resize(images: jnp.ndarray, size: int) -> jnp.ndarray:
    """Half-pixel bilinear (torch align_corners=False, no antialias) as two
    separable matmuls.  Accepts rectangular inputs [b, h, w, c] → [b, size,
    size, c] (h ≠ w gets a weight matrix per axis)."""
    wh = jnp.asarray(_bilinear_matrix(images.shape[1], size))
    ww = jnp.asarray(_bilinear_matrix(images.shape[2], size))
    out = jnp.einsum("js,bshc->bjhc", wh, images)
    out = jnp.einsum("kh,bjhc->bjkc", ww, out)
    return out


class DCLIPLoss:
    """Bundles a CLIP model + params; all methods are pure/jit-friendly."""

    def __init__(self, clip: CLIP, params: Any, normalize: bool = False):
        self.clip = clip
        self.params = params
        self.normalize = normalize
        self.image_size = clip.cfg.vision.image_size

    def _prep(self, images224):
        return clip_normalize(images224) if self.normalize else images224

    def encode_images(self, images224: jnp.ndarray) -> jnp.ndarray:
        return self.clip.apply(
            {"params": self.params}, self._prep(images224), method=CLIP.encode_image
        )

    def encode_texts(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        return self.clip.apply(
            {"params": self.params}, token_ids, method=CLIP.encode_text
        )

    def global_loss(self, images: jnp.ndarray, text_tokens: jnp.ndarray):
        """1 − cos(CLIP(resize_7_16(img)), CLIP(text)) (reference forward_2)."""
        img224 = global_resize(images)
        return 1.0 - cosine_similarity(
            self.encode_images(img224), self.encode_texts(text_tokens)
        )

    def local_loss(
        self,
        images: jnp.ndarray,       # [B, S, S, 3] in [0,1]
        centers: jnp.ndarray,      # [B, N, 2]
        object_tokens: jnp.ndarray,  # [B, N, L]
        active: jnp.ndarray,       # [B, N]
        crop_half: float = 0.2,
    ):
        """Σ_n active_n · (1 − cos) over per-object crops (reference
        forward_3 over `plms.py:256-273`); returns [B]."""
        B, N = centers.shape[:2]
        S = images.shape[1]
        starts, size = crop_window(centers, S, crop_half)  # [B, N, 2]

        def crop_one(img, start):
            return dynamic_crop(img, start, size)

        crops = jax.vmap(
            lambda img, st: jax.vmap(lambda s: crop_one(img, s))(st)
        )(images, starts)                                   # [B, N, size, size, 3]
        crops = bilinear_resize(
            crops.reshape(B * N, size, size, 3), self.image_size
        )
        img_feat = self.encode_images(crops).reshape(B, N, -1)
        txt_feat = self.encode_texts(
            object_tokens.reshape(B * N, -1)
        ).reshape(B, N, -1)
        losses = 1.0 - cosine_similarity(img_feat, txt_feat)  # [B, N]
        return jnp.sum(losses * active, axis=-1)
