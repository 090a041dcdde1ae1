"""Stock conditional-LDM encoders (beyond the CLIP text tower).

Reference: `ldm/modules/encoders/modules.py` — the conditioning encoders the
stock latent-diffusion configs instantiate:

  * `ClassEmbedder` (:21-33): class id → [B, 1, D] embedding (class-
    conditional LDMs, e.g. cin256).
  * `TransformerEmbedder` (:36-49) / `BERTEmbedder` (:80-103): token ids →
    [B, L, D] hidden states from an x-transformers `TransformerWrapper`
    (token + learned positional embeddings, pre-LN attention/FF blocks,
    final norm; `ldm/modules/x_transformer.py`).  BERTEmbedder adds a
    vocab-size 30522, len-77 default and (in the reference) a BERT
    tokenizer on device; tokenization here stays a host-side callable.

The reference vendors lucidrains' x_transformer (641 LoC) for these; the
used surface is exactly the vanilla pre-LN encoder reproduced here.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ClassEmbedder(nn.Module):
    """`modules.py:21-33`: nn.Embedding lookup, returned as [B, 1, D] so it
    drops into the cross-attention context slot."""

    n_classes: int
    embed_dim: int = 512

    @nn.compact
    def __call__(self, class_ids: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Embed(self.n_classes, self.embed_dim, name="embedding")(
            class_ids.astype(jnp.int32))
        return emb[:, None, :]


class _PreLNEncoder(nn.Module):
    dim: int
    depth: int
    heads: int = 8

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            h = nn.LayerNorm(name=f"ln1_{i}")(x)
            x = x + nn.MultiHeadDotProductAttention(
                num_heads=self.heads, qkv_features=self.dim,
                out_features=self.dim, name=f"attn_{i}")(h, h)
            h = nn.LayerNorm(name=f"ln2_{i}")(x)
            h = nn.Dense(self.dim * 4, name=f"ff1_{i}")(h)
            h = nn.gelu(h)
            x = x + nn.Dense(self.dim, name=f"ff2_{i}")(h)
        return nn.LayerNorm(name="ln_out")(x)


class TransformerEmbedder(nn.Module):
    """`modules.py:36-49`: TransformerWrapper with
    return_embeddings=True — token + absolute positional embeddings through
    `depth` pre-LN blocks; output [B, L, D] hidden states."""

    vocab_size: int
    max_seq_len: int = 77
    n_embed: int = 512
    n_layer: int = 12
    heads: int = 8

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        L = tokens.shape[1]
        x = nn.Embed(self.vocab_size, self.n_embed, name="token_emb")(tokens)
        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02),
            (self.max_seq_len, self.n_embed))
        x = x + pos[None, :L]
        return _PreLNEncoder(self.n_embed, self.n_layer, self.heads,
                             name="encoder")(x)


class BERTEmbedder(nn.Module):
    """`modules.py:80-103`: the same wrapper at BERT defaults (vocab 30522,
    len 77); the reference's on-device `BERTTokenizer` stage is a host-side
    tokenize callable here (SURVEY §7 host/device split)."""

    n_embed: int = 1280
    n_layer: int = 32
    vocab_size: int = 30522
    max_seq_len: int = 77
    heads: int = 8

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return TransformerEmbedder(
            vocab_size=self.vocab_size, max_seq_len=self.max_seq_len,
            n_embed=self.n_embed, n_layer=self.n_layer, heads=self.heads,
            name="transformer")(tokens)
