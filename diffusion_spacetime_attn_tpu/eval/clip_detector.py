"""Self-contained CLIP-based open-vocabulary detection (evaluation fallback).

The reference evaluates with an external detrex DINO-Swin-L detector on a
separate GPU environment (`evaluation/detector_result_gpt.py`, SURVEY §2.4
notes "substitute CLIP-based open-vocabulary detection" as the TPU-native
alternative).  This module scores a multi-scale grid of crops with the CLIP
image tower against per-category text embeddings ("a photo of a {name}") and
emits `eval.metrics.Detection` records, so recall / relation accuracy can be
computed entirely on-TPU when the detrex pipeline is unavailable.  It is an
approximation of the protocol, clearly labeled as such — the detections JSON
path remains the faithful route.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import CLIP
from ..pipeline.frontend import COCO_CATEGORIES
from ..pipeline.losses import bilinear_resize
from .metrics import Detection


def _grid_boxes(size: int, scales=(1.0, 0.5, 0.33)) -> np.ndarray:
    """Multi-scale sliding windows with 50% overlap, as [n, 4] x1y1x2y2."""
    boxes = []
    for s in scales:
        w = int(size * s)
        if w < 32:
            continue
        step = max(w // 2, 1)
        for y in range(0, size - w + 1, step):
            for x in range(0, size - w + 1, step):
                boxes.append((x, y, x + w, y + w))
    return np.asarray(boxes, np.float32)


class CLIPDetector:
    def __init__(
        self,
        clip: CLIP,
        params,
        tokenize,                       # text → token ids (CLIP)
        categories: Sequence[str] = COCO_CATEGORIES,
        scales=(1.0, 0.5, 0.33),
    ):
        self.clip = clip
        self.params = params
        self.categories = list(categories)
        self.scales = scales
        tokens = np.stack(
            [np.asarray(tokenize(f"a photo of a {c}"), np.int32) for c in self.categories]
        )
        self._text_emb = None
        self._tokens = tokens

        def embed_crops(params, crops):
            emb = self.clip.apply(
                {"params": params}, crops, method=CLIP.encode_image
            )
            return emb / jnp.clip(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)

        self._embed_crops = jax.jit(embed_crops)

    def _text(self):
        if self._text_emb is None:
            emb = self.clip.apply(
                {"params": self.params}, jnp.asarray(self._tokens),
                method=CLIP.encode_text,
            )
            self._text_emb = emb / jnp.clip(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8
            )
        return self._text_emb

    def __call__(self, image01: np.ndarray, top_per_category: int = 1) -> List[Detection]:
        """image01: [S, S, 3] in [0,1] → detections (score = softmax prob of
        the category over all categories for the best crop)."""
        size = image01.shape[0]
        boxes = _grid_boxes(size, self.scales)
        crops = []
        im = jnp.asarray(image01)
        vsize = self.clip.cfg.vision.image_size
        for x1, y1, x2, y2 in boxes.astype(int):
            crop = im[y1:y2, x1:x2]
            crops.append(bilinear_resize(crop[None], vsize)[0])
        crop_emb = self._embed_crops(self.params, jnp.stack(crops))  # [n, d]
        sims = np.asarray(crop_emb @ self._text().T)                  # [n, C]
        probs = np.exp(sims * 100.0)
        probs = probs / probs.sum(-1, keepdims=True)
        dets: List[Detection] = []
        for c, name in enumerate(self.categories):
            order = np.argsort(-probs[:, c])[:top_per_category]
            for i in order:
                dets.append(Detection(tuple(boxes[i]), name, float(probs[i, c])))
        return dets
