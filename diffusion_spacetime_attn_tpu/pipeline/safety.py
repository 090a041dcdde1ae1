"""Safety-checker and invisible-watermark hooks.

Reference surface: `scripts/txt2img-gpt.py:32-35,75-101` — diffusers
`StableDiffusionSafetyChecker` (CLIP-based concept matching, replaces flagged
images with black) and `scripts/txt2img.py` invisible-watermark (`put_watermark`,
decoded by `scripts/tests/test_watermark.py`).

TPU-native equivalents:
  * `SafetyChecker`: cosine similarity of CLIP image embeddings against
    loadable concept embeddings; without concept weights it is a no-op that
    preserves the API (the checker is a *hook*, not a capability gap — the
    reference's checker also needs downloaded weights).
  * watermarking lives in `utils.watermark` (blind DCT-free bit-plane
    scheme, self-contained encode+decode).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.clip import CLIP
from ..pipeline.losses import bilinear_resize


class SafetyChecker:
    def __init__(
        self,
        clip: Optional[CLIP] = None,
        params=None,
        concept_embeds: Optional[np.ndarray] = None,  # [C, proj_dim], unit norm
        threshold: float = 0.3,
    ):
        self.clip = clip
        self.params = params
        self.concepts = concept_embeds
        self.threshold = threshold

    def __call__(self, images01: jnp.ndarray) -> Tuple[jnp.ndarray, np.ndarray]:
        """→ (checked images, has_nsfw flags).  Flagged images are blacked
        out (reference `txt2img-gpt.py:94-101` semantics)."""
        B = images01.shape[0]
        if self.clip is None or self.concepts is None:
            return images01, np.zeros(B, bool)
        size = self.clip.cfg.vision.image_size
        emb = self.clip.apply(
            {"params": self.params},
            bilinear_resize(images01, size),
            method=CLIP.encode_image,
        )
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        sims = emb @ jnp.asarray(self.concepts).T        # [B, C]
        flagged = np.asarray(jnp.max(sims, axis=-1) > self.threshold)
        out = jnp.where(flagged[:, None, None, None], jnp.zeros_like(images01), images01)
        return out, flagged
