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


CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class DiffusersSafetyChecker:
    """Faithful diffusers `StableDiffusionSafetyChecker` port — the exact
    module the reference instantiates (`txt2img-gpt.py:32-35,94-101`).

    Scoring semantics replicate diffusers `safety_checker.py` forward:
      image_embeds = visual_projection(vision_pooled)      (Linear, no bias)
      special_scores = cos(image_embeds, special_care_embeds) − special_w
      adjustment     = 0.01 where any special_score > 0 else 0
      concept_scores = cos(image_embeds, concept_embeds) − concept_w + adj
      nsfw           = any(concept_score > 0); flagged images → black.
    Inputs are resized to the tower's image size and CLIP-normalized (the
    diffusers feature-extractor preprocessing; for the square generated
    images the only deviation is bilinear-vs-bicubic resampling).
    """

    def __init__(self, vision_tower, tower_params, proj_kernel,
                 concept_embeds, concept_weights,
                 special_embeds, special_weights):
        self.vision = vision_tower
        self.params = tower_params
        self.proj = jnp.asarray(proj_kernel)               # [hidden, proj]
        self.concepts = jnp.asarray(concept_embeds)        # [C, proj]
        self.concept_w = jnp.asarray(concept_weights)      # [C]
        self.specials = jnp.asarray(special_embeds)        # [S, proj]
        self.special_w = jnp.asarray(special_weights)      # [S]

    @classmethod
    def from_checkpoint(cls, path_or_state, cfg=None):
        """Build from a diffusers safety-checker checkpoint (state dict with
        `vision_model.vision_model.*`, `visual_projection.weight`,
        `concept_embeds`, `special_care_embeds`, and their `*_weights`)."""
        from ..config import CLIPVisionConfig
        from ..models.clip import CLIPVisionTower
        from ..utils import convert

        state = (convert.load_torch_checkpoint(path_or_state)
                 if isinstance(path_or_state, str) else path_or_state)
        tower_params = convert.convert_hf_clip_vision(
            state, prefix="vision_model.vision_model.")
        if cfg is None:
            # infer dims from the state dict (SD safety checker = ViT-L/14
            # vision tower at 224², hidden 1024, proj 768)
            pe = state["vision_model.vision_model.embeddings.patch_embedding.weight"]
            hidden, _, patch, _ = pe.shape
            n_pos = state[
                "vision_model.vision_model.embeddings.position_embedding.weight"
            ].shape[0]
            image_size = int(round((n_pos - 1) ** 0.5)) * patch
            layers = 0
            while (f"vision_model.vision_model.encoder.layers.{layers}."
                   "layer_norm1.weight") in state:
                layers += 1
            heads = hidden // 64
            cfg = CLIPVisionConfig(image_size=image_size, patch_size=patch,
                                   width=hidden, layers=layers, heads=heads)
        tower = CLIPVisionTower(cfg)
        return cls(
            tower, tower_params,
            np.asarray(state["visual_projection.weight"]).T,
            state["concept_embeds"], state["concept_embeds_weights"],
            state["special_care_embeds"], state["special_care_embeds_weights"],
        )

    def image_embeds(self, images01: jnp.ndarray) -> jnp.ndarray:
        size = self.vision.cfg.image_size
        pixels = bilinear_resize(images01, size)
        pixels = (pixels - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
        pooled = self.vision.apply({"params": self.params}, pixels)
        return pooled @ self.proj

    def __call__(self, images01: jnp.ndarray) -> Tuple[jnp.ndarray, np.ndarray]:
        emb = self.image_embeds(images01)
        embn = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        cn = self.concepts / jnp.linalg.norm(self.concepts, axis=-1,
                                             keepdims=True)
        sn = self.specials / jnp.linalg.norm(self.specials, axis=-1,
                                             keepdims=True)
        special_scores = embn @ sn.T - self.special_w[None, :]
        adjustment = jnp.where(
            jnp.any(special_scores > 0, axis=-1), 0.01, 0.0)[:, None]
        concept_scores = embn @ cn.T - self.concept_w[None, :] + adjustment
        flagged = np.asarray(jnp.any(concept_scores > 0, axis=-1))
        out = jnp.where(flagged[:, None, None, None],
                        jnp.zeros_like(images01), images01)
        return out, flagged


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
