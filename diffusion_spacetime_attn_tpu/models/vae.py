"""AutoencoderKL (f=8, z=4) — NHWC flax.linen.

Architecture parity with the reference (`ldm/models/autoencoder.py:285-352`,
`ldm/modules/diffusionmodules/model.py` Encoder/Decoder/ResnetBlock/AttnBlock,
config `v1-inference.yaml:46-68`).  Only `decode` is on the optimization hot
path (inside the CLIP-loss tape, `plms.py:249-250`); `encode` is provided for
img2img-class workflows.

CompVis quirks kept for weight compatibility: GroupNorm eps 1e-6, swish
nonlinearity, *asymmetric* (0,1)×(0,1) padding on the strided downsample
conv, single-head AttnBlock in the bottleneck.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import VAEConfig


def _norm(name):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32, name=name)


def _gn(x, norm):
    return norm(x.astype(jnp.float32)).astype(x.dtype)


class VAEResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _gn(x, _norm("norm1"))
        h = nn.swish(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = _gn(h, _norm("norm2"))
        h = nn.swish(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head spatial self-attention over H·W tokens
    (reference `model.py` AttnBlock)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _gn(x, _norm("norm"))
        q = nn.Conv(C, (1, 1), dtype=self.dtype, name="q")(h).reshape(B, H * W, C)
        k = nn.Conv(C, (1, 1), dtype=self.dtype, name="k")(h).reshape(B, H * W, C)
        v = nn.Conv(C, (1, 1), dtype=self.dtype, name="v")(h).reshape(B, H * W, C)
        sim = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(sim * (C ** -0.5), axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v, preferred_element_type=jnp.float32)
        out = out.reshape(B, H, W, C).astype(x.dtype)
        out = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        x = x.astype(dtype)
        h = nn.Conv(cfg.ch, (3, 3), dtype=dtype, name="conv_in")(x)
        num_levels = len(cfg.ch_mult)
        curr_res = cfg.resolution
        for level, mult in enumerate(cfg.ch_mult):
            ch = cfg.ch * mult
            for i in range(cfg.num_res_blocks):
                h = VAEResnetBlock(ch, dtype=dtype, name=f"down_{level}_block_{i}")(h)
                if curr_res in cfg.attn_resolutions:
                    h = VAEAttnBlock(dtype=dtype, name=f"down_{level}_attn_{i}")(h)
            if level != num_levels - 1:
                curr_res //= 2
                # CompVis pads (0,1,0,1) before the stride-2 conv
                h = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
                    dtype=dtype, name=f"down_{level}_downsample",
                )(h)
        ch = cfg.ch * cfg.ch_mult[-1]
        h = VAEResnetBlock(ch, dtype=dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(ch, dtype=dtype, name="mid_block_2")(h)
        h = _gn(h, _norm("norm_out"))
        h = nn.swish(h)
        h = nn.Conv(2 * cfg.z_channels, (3, 3), dtype=dtype, name="conv_out")(h)
        return h  # moments [B, H/8, W/8, 2*z]


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        z = z.astype(dtype)
        ch = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(ch, (3, 3), dtype=dtype, name="conv_in")(z)
        h = VAEResnetBlock(ch, dtype=dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(ch, dtype=dtype, name="mid_block_2")(h)
        curr_res = cfg.resolution // (2 ** (len(cfg.ch_mult) - 1))
        for level in reversed(range(len(cfg.ch_mult))):
            ch = cfg.ch * cfg.ch_mult[level]
            for i in range(cfg.num_res_blocks + 1):
                h = VAEResnetBlock(ch, dtype=dtype, name=f"up_{level}_block_{i}")(h)
                if curr_res in cfg.attn_resolutions:
                    h = VAEAttnBlock(dtype=dtype, name=f"up_{level}_attn_{i}")(h)
            if level != 0:
                curr_res *= 2
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = nn.Conv(C, (3, 3), dtype=dtype, name=f"up_{level}_upsample")(h)
        h = _gn(h, _norm("norm_out"))
        h = nn.swish(h)
        h = nn.Conv(cfg.out_ch, (3, 3), dtype=dtype, name="conv_out")(h)
        return h.astype(jnp.float32)


class AutoencoderKL(nn.Module):
    """encode → DiagonalGaussian moments; decode.  The SD latent scale factor
    (`v1-inference.yaml:17`) is applied by the callers in pipeline/, matching
    `ddpm.py:706` decode_first_stage (z / scale) and `encode_first_stage`."""

    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        dtype = jnp.dtype(self.cfg.dtype)
        self.quant_conv = nn.Conv(2 * self.cfg.embed_dim, (1, 1), dtype=dtype)
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1), dtype=dtype)

    def encode_moments(self, x):
        """[B,H,W,3] in [-1,1] → (mean, logvar) each [B,H/8,W/8,embed_dim]."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, rng=None):
        mean, logvar = self.encode_moments(x)
        if rng is None:
            return mean
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)

    def decode(self, z):
        """[B,h,w,z] (unscaled) → [B,H,W,3] in ~[-1,1]."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None):
        return self.decode(self.encode(x, rng))


class VectorQuantizer(nn.Module):
    """taming-style nearest-neighbor codebook quantizer as used by the
    reference `VQModel` (`ldm/models/autoencoder.py:39-41`; the quantizer
    itself is external `taming.modules.vqvae.quantize.VectorQuantizer2`).

    forward: z [B,h,w,C] → (z_q with straight-through gradients, emb_loss,
    indices [B,h,w]).  emb_loss is the standard VQ-VAE objective with the
    taming legacy=True weighting:
        beta·mean((sg[z_q] − z)²) + mean((z_q − sg[z])²)
    """

    n_embed: int
    embed_dim: int
    beta: float = 0.25

    @nn.compact
    def __call__(self, z):
        codebook = self.param(
            "embedding",
            # taming init: uniform(-1/n, 1/n)
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / self.n_embed,
                maxval=1.0 / self.n_embed),
            (self.n_embed, self.embed_dim),
        )
        flat = z.reshape(-1, self.embed_dim)
        # ‖z − e‖² = ‖z‖² + ‖e‖² − 2 z·e  (argmin over codes, MXU matmul)
        d = (
            jnp.sum(flat ** 2, axis=1, keepdims=True)
            + jnp.sum(codebook ** 2, axis=1)[None, :]
            - 2.0 * flat @ codebook.T
        )
        idx = jnp.argmin(d, axis=1)
        z_q = codebook[idx].reshape(z.shape)
        loss = (
            self.beta * jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2)
            + jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)
        )
        # straight-through estimator
        z_q = z + jax.lax.stop_gradient(z_q - z)
        return z_q, loss, idx.reshape(z.shape[:-1])

    def embed_code(self, code):
        """indices [B,h,w] → codebook vectors [B,h,w,C]
        (`decode_code`, `autoencoder.py:117-120`)."""
        codebook = self.variables["params"]["embedding"]
        return codebook[code]


class VQModel(nn.Module):
    """Reference `VQModel` (`ldm/models/autoencoder.py:14-262`): the same
    Encoder/Decoder stack with a vector-quantized bottleneck instead of the
    KL gaussian.  `encode` returns (quant, emb_loss, indices); `decode`
    takes quantized latents.  The z_channels config doubles as embed_dim
    input to quant_conv exactly like the torch ctor.
    """

    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        dtype = jnp.dtype(self.cfg.dtype)
        self.quantize = VectorQuantizer(self.cfg.n_embed, self.cfg.embed_dim)
        self.quant_conv = nn.Conv(self.cfg.embed_dim, (1, 1), dtype=dtype)
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1), dtype=dtype)

    def encode_to_prequant(self, x):
        return self.quant_conv(self.encoder(x))

    def encode(self, x):
        return self.quantize(self.encode_to_prequant(x))

    def decode(self, quant):
        return self.decoder(self.post_quant_conv(quant))

    def decode_code(self, code):
        return self.decode(self.quantize.embed_code(code))

    def __call__(self, x):
        quant, emb_loss, idx = self.encode(x)
        return self.decode(quant), emb_loss, idx

    # --- VQModelInterface semantics (`autoencoder.py:264-283`): the LDM
    # first stage encodes to PRE-quant h and quantizes inside decode ---
    def interface_encode(self, x):
        return self.encode_to_prequant(x)

    def interface_decode(self, h, force_not_quantize: bool = False):
        if not force_not_quantize:
            h, _, _ = self.quantize(h)
        return self.decode(h)
