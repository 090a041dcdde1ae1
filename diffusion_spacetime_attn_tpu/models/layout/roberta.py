"""RoBERTa-base encoder with the layout predictor's object-position embedding.

Reference: `layout_predictor/LayoutTransformer/model/Model.py:533-628`
(fairseq RobertaEncoder rebuilt from pickled args) and the injected
`object_embedding` parameter added to the token embeddings at object
positions (`Model.py:72-74,222-227`).

Architecture = standard RoBERTa-base: learned positions offset past the pad
index (position = pad_id + cumsum(mask)), embedding LayerNorm, 12 post-LN
transformer layers (residual → LayerNorm), erf-GELU.  Numerics match HF
`RobertaModel` (parity-tested with converted random weights).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import LayoutConfig
from ..layers import norm_f32


class RobertaSelfAttention(nn.Module):
    hidden: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask):
        B, L, _ = x.shape
        dh = self.hidden // self.heads
        q = nn.Dense(self.hidden, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.hidden, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.hidden, dtype=self.dtype, name="v")(x)
        q = q.reshape(B, L, self.heads, dh)
        k = k.reshape(B, L, self.heads, dh)
        v = v.reshape(B, L, self.heads, dh)
        sim = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        sim = sim * (dh ** -0.5)
        neg = jnp.asarray(-1e9, jnp.float32)
        sim = jnp.where(pad_mask[:, None, None, :], sim, neg)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32)
        out = out.reshape(B, L, self.hidden).astype(x.dtype)
        return nn.Dense(self.hidden, dtype=self.dtype, name="out")(out)


class RobertaLayer(nn.Module):
    """Post-LN transformer layer (fairseq normalize_before=False)."""

    hidden: int
    heads: int
    ffn_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask):
        a = RobertaSelfAttention(self.hidden, self.heads, dtype=self.dtype, name="attn")(
            x, pad_mask
        )
        x = norm_f32(nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="attn_ln"), x + a)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(h)
        x = norm_f32(nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_ln"), x + h)
        return x


class RobertaBackbone(nn.Module):
    cfg: LayoutConfig

    @nn.compact
    def __call__(
        self,
        token_ids: jnp.ndarray,               # [B, L] int32, pad = cfg.pad_token_id
        object_pos: Optional[jnp.ndarray] = None,  # [B, L] bool/float
    ) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        pad = cfg.pad_token_id
        mask = token_ids != pad                              # [B, L]

        tok = nn.Embed(cfg.vocab_size, cfg.hidden, dtype=dtype, name="token_embedding")(
            token_ids
        )
        # RoBERTa positions: pad_id + cumulative index among non-pad tokens
        positions = pad + jnp.cumsum(mask.astype(jnp.int32), axis=-1) * mask
        pos = nn.Embed(
            cfg.max_positions, cfg.hidden, dtype=dtype, name="position_embedding"
        )(positions)
        x = tok + pos
        x = norm_f32(nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="emb_ln"), x)

        if object_pos is not None:
            obj_emb = self.param(
                "object_embedding",
                nn.initializers.kaiming_normal(),
                (1, cfg.hidden),
            )
            x = x + obj_emb[None].astype(dtype) * object_pos[..., None].astype(dtype)

        # zero padded positions (reference `Model.py:231-233`)
        x = x * mask[..., None].astype(x.dtype)

        for i in range(cfg.layers):
            x = RobertaLayer(
                cfg.hidden, cfg.heads, cfg.ffn_dim, dtype=dtype, name=f"layer_{i}"
            )(x, mask)
        return x.astype(jnp.float32)
