"""LayoutPredictor = RoBERTa backbone (+object embedding) + GMM head.

Reference: `Rel2Bbox` (`model/Model.py:1017-1034`) — encoder features →
BBox_Head → per-token sampled (x, y) + raw GMM params.  Training and
inference share the same single forward (the reference's `inference` path,
`greedy_PDF`, reduces to the same non-autoregressive call).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import LayoutConfig
from .gmm_head import GMMHead, sample_xy
from .roberta import RobertaBackbone


class LayoutPredictor(nn.Module):
    cfg: LayoutConfig

    def setup(self):
        self.backbone = RobertaBackbone(self.cfg)
        self.head = GMMHead(self.cfg)

    def __call__(
        self,
        token_ids: jnp.ndarray,                    # [B, L]
        object_pos: Optional[jnp.ndarray] = None,  # [B, L]
    ) -> jnp.ndarray:
        """→ raw GMM params [B, L, 6K]."""
        features = self.backbone(token_ids, object_pos)
        return self.head(features)

    def predict_xy(
        self,
        token_ids: jnp.ndarray,
        object_pos: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        greedy_component: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """→ (xy [B, L, 2], raw gmm [B, L, 6K])."""
        raw = self(token_ids, object_pos)
        return sample_xy(raw, rng, greedy_component), raw


def create_layout_predictor(cfg: LayoutConfig, rng: jax.Array):
    model = LayoutPredictor(cfg)
    tokens = jnp.full((1, cfg.max_len), cfg.pad_token_id, jnp.int32)
    params = model.init(rng, tokens, jnp.zeros((1, cfg.max_len), jnp.bool_))["params"]
    return model, params
