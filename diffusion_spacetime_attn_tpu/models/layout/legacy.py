"""Legacy layout model family (Rel2Layout / Rel2RegLayout) — TPU-native.

Reference: `model/Model.py:937-1016` (Rel2Layout, Rel2RegLayout),
`model/Encoder.py:20-152` (joeynmt-style pre-LN TransformerEncoder +
RelEncoder with 4-way summed embeddings and 3 classifier heads),
`model/Decoder.py:211-306` (BboxDecoder: AR decoder over discrete
(cls, pos, shape) token trios; BboxRegDecoder: cls tokens + sigmoid boxes),
`model/Embedding.py:50-128` (Sentence_Embeddings / Add_Embeddings /
ConcatBox_Embeddings), `model/Inference.py:8-301` (greedy / beam decode).

These models are **dead code in the reference** — `build_model`
(`model/build_model.py:18-33`) only ever constructs `Rel2Bbox` and
`build_trainer` only `PretrainTrainer` — reproduced here for surface
completeness at small scale.  TPU-first choices: the greedy decoder is a
`lax.scan` with a fixed output length (one compiled program, no Python
autoregression), and beam search keeps a static [B, K] beam in the scan
carry (top-k over cls log-probs; pos/shape decoded greedily per beam, the
reference's behavior).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

PAD, BOS, EOS, MASK = 0, 1, 2, 3  # `Model.py:949-951`, VGmsdnDataset docstring


@dataclasses.dataclass(frozen=True)
class LegacyConfig:
    """`Rel2Layout.__init__` defaults (`Model.py:939`)."""

    vocab_size: int = 204
    obj_id_size: int = 154      # obj_classes_size (Encoder.py:125)
    cls_size: int = 154
    pos_size: int = 68
    shape_size: int = 68
    hidden: int = 512
    layers: int = 6
    heads: int = 8
    max_rel_pair: int = 33      # segment-embedding table (Embedding.py:57)
    max_out_len: int = 64       # greedy length (Model.py:969)


def _mha(heads, hidden, name):
    return nn.MultiHeadDotProductAttention(
        num_heads=heads, qkv_features=hidden, out_features=hidden, name=name
    )


class PreLNBlock(nn.Module):
    """One joeynmt encoder layer: LN→self-attn→res, LN→FF→res
    (`transformer_layers.py:318-361`)."""

    hidden: int
    heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(epsilon=1e-6, name="ln1")(x)
        x = x + _mha(self.heads, self.hidden, "attn")(h, h, mask=mask)
        h = nn.LayerNorm(epsilon=1e-6, name="ln2")(x)
        h = nn.Dense(self.hidden * 4, name="ff1")(h)
        h = nn.relu(h)
        return x + nn.Dense(self.hidden, name="ff2")(h)


class PreLNDecoderBlock(nn.Module):
    """Decoder layer: LN→causal self-attn→res, LN→cross-attn→res, LN→FF→res
    (`transformer_layers.py:363-462`)."""

    hidden: int
    heads: int

    @nn.compact
    def __call__(self, x, memory, self_mask, cross_mask):
        h = nn.LayerNorm(epsilon=1e-6, name="ln1")(x)
        x = x + _mha(self.heads, self.hidden, "self_attn")(h, h, mask=self_mask)
        h = nn.LayerNorm(epsilon=1e-6, name="ln2")(x)
        x = x + _mha(self.heads, self.hidden, "cross_attn")(
            h, memory, mask=cross_mask)
        h = nn.LayerNorm(epsilon=1e-6, name="ln3")(x)
        h = nn.Dense(self.hidden * 4, name="ff1")(h)
        h = nn.relu(h)
        return x + nn.Dense(self.hidden, name="ff2")(h)


class RelEncoder(nn.Module):
    """4-way summed embeddings → pre-LN encoder → 3 classifier heads
    (`Encoder.py:120-152`, `Embedding.py:50-82`)."""

    cfg: LegacyConfig

    @nn.compact
    def __call__(self, tokens, obj_ids, segments, token_types, pad_mask):
        c = self.cfg
        emb = (
            nn.Embed(c.vocab_size, c.hidden, name="word")(tokens)
            + nn.Embed(c.obj_id_size, c.hidden, name="obj_id")(obj_ids)
            + nn.Embed(c.max_rel_pair, c.hidden, name="segment")(segments)
            + nn.Embed(4, c.hidden, name="token_type")(token_types)
        )
        mask = pad_mask[:, None, None, :]  # [B,1,1,L] attend only to non-pad
        x = emb
        for i in range(c.layers):
            x = PreLNBlock(c.hidden, c.heads, name=f"layer_{i}")(x, mask)
        x = nn.LayerNorm(epsilon=1e-6, name="ln_out")(x)
        return (
            x,
            nn.Dense(c.vocab_size, name="vocab_cls")(x),
            nn.Dense(c.obj_id_size, name="obj_id_cls")(x),
            nn.Dense(4, name="token_type_cls")(x),
        )


class _Decoder(nn.Module):
    cfg: LegacyConfig

    @nn.compact
    def __call__(self, trg_embed, memory, src_pad_mask, causal: bool = True):
        c = self.cfg
        T = trg_embed.shape[1]
        self_mask = None
        if causal:
            self_mask = jnp.tril(jnp.ones((1, 1, T, T), bool))
        cross = src_pad_mask[:, None, None, :]
        x = trg_embed
        for i in range(c.layers):
            x = PreLNDecoderBlock(c.hidden, c.heads, name=f"layer_{i}")(
                x, memory, self_mask, cross)
        return nn.LayerNorm(epsilon=1e-6, name="ln_out")(x)


class Rel2Layout(nn.Module):
    """Discrete AR layout decoder: (cls, pos, shape) token trios
    (`Model.py:937-972`, `Decoder.py:211-258`)."""

    cfg: LegacyConfig

    def setup(self):
        c = self.cfg
        self.encoder = RelEncoder(c)
        self.cls_embed = nn.Embed(c.cls_size, c.hidden, name="cls_embed")
        self.pos_embed = nn.Embed(c.pos_size, c.hidden, name="pos_embed")
        self.shape_embed = nn.Embed(c.shape_size, c.hidden, name="shape_embed")
        self.latent = nn.Dense(c.hidden, name="latent")  # Decoder.py:224
        self.decoder = _Decoder(c)
        self.cls_head = nn.Dense(c.cls_size, name="cls_head")
        self.pos_head = nn.Dense(c.pos_size, name="pos_head")
        self.shape_head = nn.Dense(c.shape_size, name="shape_head")

    def encode(self, tokens, obj_ids, segments, token_types, pad_mask):
        memory, *_ = self.encoder(tokens, obj_ids, segments, token_types, pad_mask)
        return self.latent(memory)

    def decode(self, cls_tok, pos_tok, shape_tok, memory, src_pad_mask):
        trg = (self.cls_embed(cls_tok) + self.pos_embed(pos_tok)
               + self.shape_embed(shape_tok))  # Add_Embeddings (Embedding.py:85)
        h = self.decoder(trg, memory, src_pad_mask)
        return self.cls_head(h), self.pos_head(h), self.shape_head(h)

    def __call__(self, tokens, obj_ids, segments, token_types, pad_mask,
                 cls_tok, pos_tok, shape_tok):
        """Teacher-forced training forward (`Model.py:954-959`)."""
        memory = self.encode(tokens, obj_ids, segments, token_types, pad_mask)
        return self.decode(cls_tok, pos_tok, shape_tok, memory, src_pad_mask=pad_mask)


class Rel2RegLayout(nn.Module):
    """Regression variant: cls tokens + continuous sigmoid boxes
    (`Model.py:974-1016`, `Decoder.py:260-306`)."""

    cfg: LegacyConfig

    def setup(self):
        c = self.cfg
        self.encoder = RelEncoder(c)
        self.cls_embed = nn.Embed(c.cls_size, c.hidden, name="cls_embed")
        self.box_proj = nn.Dense(c.hidden, name="box_proj")  # ConcatBox
        self.merge = nn.Dense(c.hidden, name="merge")
        self.decoder = _Decoder(c)
        self.cls_head = nn.Dense(c.cls_size, name="cls_head")
        self.box_head = nn.Dense(4, name="box_head")

    def encode(self, tokens, obj_ids, segments, token_types, pad_mask):
        memory, *_ = self.encoder(tokens, obj_ids, segments, token_types, pad_mask)
        return memory

    def decode(self, cls_tok, boxes, memory, src_pad_mask):
        trg = self.merge(jnp.concatenate(
            [self.cls_embed(cls_tok), self.box_proj(boxes)], axis=-1))
        h = self.decoder(trg, memory, src_pad_mask)
        return self.cls_head(h), nn.sigmoid(self.box_head(h))

    def __call__(self, tokens, obj_ids, segments, token_types, pad_mask,
                 cls_tok, boxes):
        memory = self.encode(tokens, obj_ids, segments, token_types, pad_mask)
        return self.decode(cls_tok, boxes, memory, src_pad_mask=pad_mask)


def greedy_decode(model: Rel2Layout, params, tokens, obj_ids, segments,
                  token_types, pad_mask, max_len: Optional[int] = None):
    """Greedy AR decode as one compiled loop (`Inference.py:8-83`).

    Re-runs the decoder over the (fixed-length) prefix each step — O(T²)
    like the reference (which has no KV cache either) but a single XLA
    program.  Returns (cls, pos, shape) [B, T] plus a validity mask that
    ends at the first EOS cls token.
    """
    c = model.cfg
    T = max_len or c.max_out_len
    B = tokens.shape[0]
    memory = model.apply({"params": params}, tokens, obj_ids, segments,
                         token_types, pad_mask, method=type(model).encode)

    def body(carry, t):
        cls_t, pos_t, shp_t = carry  # [B, T] buffers, BOS-initialized
        lc, lp, ls = model.apply(
            {"params": params}, cls_t, pos_t, shp_t, memory, pad_mask,
            method=type(model).decode)
        nc = jnp.argmax(lc[:, t], -1)
        np_ = jnp.argmax(lp[:, t], -1)
        ns = jnp.argmax(ls[:, t], -1)
        cls_t = cls_t.at[:, t + 1].set(nc)
        pos_t = pos_t.at[:, t + 1].set(np_)
        shp_t = shp_t.at[:, t + 1].set(ns)
        return (cls_t, pos_t, shp_t), (nc, np_, ns)

    init = tuple(
        jnp.full((B, T + 1), BOS, jnp.int32) for _ in range(3)
    )
    (_, _, _), (cls_o, pos_o, shp_o) = jax.lax.scan(
        body, init, jnp.arange(T))
    cls_o, pos_o, shp_o = (jnp.moveaxis(o, 0, 1) for o in (cls_o, pos_o, shp_o))
    seen_eos = jnp.cumsum((cls_o == EOS).astype(jnp.int32), axis=1)
    valid = (seen_eos - (cls_o == EOS)) == 0  # include the EOS position
    return cls_o, pos_o, shp_o, valid


def beam_decode(model: Rel2Layout, params, tokens, obj_ids, segments,
                token_types, pad_mask, beam: int = 4,
                max_len: Optional[int] = None) -> Tuple[jnp.ndarray, ...]:
    """Beam search over cls log-probs, greedy pos/shape per hypothesis
    (`Inference.py:84-301`).  Static [B, K] beam in a scan carry; finished
    hypotheses (EOS) absorb further expansion with zero added score."""
    c = model.cfg
    T = max_len or c.max_out_len
    B = tokens.shape[0]
    K = beam
    memory = model.apply({"params": params}, tokens, obj_ids, segments,
                         token_types, pad_mask, method=type(model).encode)
    memory_k = jnp.repeat(memory, K, axis=0)
    pad_k = jnp.repeat(pad_mask, K, axis=0)

    cls_t = jnp.full((B, K, T + 1), BOS, jnp.int32)
    pos_t = jnp.full((B, K, T + 1), BOS, jnp.int32)
    shp_t = jnp.full((B, K, T + 1), BOS, jnp.int32)
    # first expansion must come from one hypothesis only
    scores = jnp.tile(
        jnp.array([0.0] + [-1e9] * (K - 1), jnp.float32)[None], (B, 1))
    done = jnp.zeros((B, K), bool)

    def body(carry, t):
        cls_t, pos_t, shp_t, scores, done = carry
        lc, lp, ls = model.apply(
            {"params": params},
            cls_t.reshape(B * K, T + 1), pos_t.reshape(B * K, T + 1),
            shp_t.reshape(B * K, T + 1), memory_k, pad_k,
            method=type(model).decode)
        logp = jax.nn.log_softmax(lc[:, t].reshape(B, K, -1), -1)
        # finished beams: only "EOS again" allowed, at zero cost
        frozen = jnp.full_like(logp, -1e9).at[..., EOS].set(0.0)
        logp = jnp.where(done[..., None], frozen, logp)
        cand = scores[..., None] + logp                      # [B, K, V]
        V = cand.shape[-1]
        top, flat_idx = jax.lax.top_k(cand.reshape(B, K * V), K)
        src = flat_idx // V                                  # parent beam
        tok = flat_idx % V
        gather = lambda a: jnp.take_along_axis(
            a, src[..., None], axis=1)                       # reorder beams
        cls_t, pos_t, shp_t = gather(cls_t), gather(pos_t), gather(shp_t)
        done = jnp.take_along_axis(done, src, axis=1)
        pos_best = jnp.take_along_axis(
            jnp.argmax(lp[:, t].reshape(B, K, -1), -1), src, axis=1)
        shp_best = jnp.take_along_axis(
            jnp.argmax(ls[:, t].reshape(B, K, -1), -1), src, axis=1)
        cls_t = cls_t.at[:, :, t + 1].set(tok)
        pos_t = pos_t.at[:, :, t + 1].set(pos_best)
        shp_t = shp_t.at[:, :, t + 1].set(shp_best)
        done = done | (tok == EOS)
        return (cls_t, pos_t, shp_t, top, done), None

    (cls_t, pos_t, shp_t, scores, _), _ = jax.lax.scan(
        body, (cls_t, pos_t, shp_t, scores, done), jnp.arange(T))
    return cls_t[:, :, 1:], pos_t[:, :, 1:], shp_t[:, :, 1:], scores


def greedy_decode_reg(model: Rel2RegLayout, params, tokens, obj_ids, segments,
                      token_types, pad_mask, max_len: Optional[int] = None):
    """Greedy decode of the regression variant (`Inference_Reg.py:8-`):
    argmax cls token + predicted box fed back each step."""
    c = model.cfg
    T = max_len or c.max_out_len
    B = tokens.shape[0]
    memory = model.apply({"params": params}, tokens, obj_ids, segments,
                         token_types, pad_mask, method=Rel2RegLayout.encode)

    def body(carry, t):
        cls_t, box_t = carry
        lc, boxes = model.apply({"params": params}, cls_t, box_t, memory,
                                pad_mask, method=Rel2RegLayout.decode)
        nc = jnp.argmax(lc[:, t], -1)
        nb = boxes[:, t]
        cls_t = cls_t.at[:, t + 1].set(nc)
        box_t = box_t.at[:, t + 1].set(nb)
        return (cls_t, box_t), (nc, nb)

    init = (jnp.full((B, T + 1), BOS, jnp.int32),
            jnp.zeros((B, T + 1, 4), jnp.float32))
    _, (cls_o, box_o) = jax.lax.scan(body, init, jnp.arange(T))
    return jnp.moveaxis(cls_o, 0, 1), jnp.moveaxis(box_o, 0, 1)


class Text2Layout(nn.Module):
    """Caption → discrete layout (reference `Model.py:817-935`): an HF BERT
    encoder (with on-device tokenization, a host/device violation there)
    feeding the same discrete (cls, pos, shape) AR decoder.  Here the
    encoder is the framework's pre-LN text transformer
    (`models/encoders.TransformerEmbedder` semantics) over host-tokenized
    ids; `greedy_decode` / `beam_decode` work unchanged via the shared
    encode/decode interface."""

    cfg: LegacyConfig
    max_seq_len: int = 64      # `Model.py:845` max_length=64

    def setup(self):
        c = self.cfg
        from ..encoders import TransformerEmbedder

        self.text_encoder = TransformerEmbedder(
            vocab_size=c.vocab_size, max_seq_len=self.max_seq_len,
            n_embed=c.hidden, n_layer=c.layers, heads=c.heads,
            name="text_encoder")
        self.cls_embed = nn.Embed(c.cls_size, c.hidden, name="cls_embed")
        self.pos_embed = nn.Embed(c.pos_size, c.hidden, name="pos_embed")
        self.shape_embed = nn.Embed(c.shape_size, c.hidden, name="shape_embed")
        self.decoder = _Decoder(c)
        self.cls_head = nn.Dense(c.cls_size, name="cls_head")
        self.pos_head = nn.Dense(c.pos_size, name="pos_head")
        self.shape_head = nn.Dense(c.shape_size, name="shape_head")

    def encode(self, tokens, obj_ids, segments, token_types, pad_mask):
        # extra operands accepted (ignored) so greedy/beam decode reuse works
        return self.text_encoder(tokens)

    def decode(self, cls_tok, pos_tok, shape_tok, memory, src_pad_mask):
        trg = (self.cls_embed(cls_tok) + self.pos_embed(pos_tok)
               + self.shape_embed(shape_tok))
        h = self.decoder(trg, memory, src_pad_mask)
        return self.cls_head(h), self.pos_head(h), self.shape_head(h)

    def __call__(self, tokens, pad_mask, cls_tok, pos_tok, shape_tok):
        memory = self.text_encoder(tokens)
        return self.decode(cls_tok, pos_tok, shape_tok, memory, pad_mask)
