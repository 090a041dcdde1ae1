"""Shared NN building blocks (flax.linen), NHWC layout, TPU numerics rules:
normalizations and softmax in float32, matmuls in the configured compute
dtype with float32 accumulation.

Reference counterparts: `ldm/modules/attention.py:42-82,157-346` and
`ldm/modules/diffusionmodules/openaimodel.py` (ResBlock, timestep_embedding).
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import (
    SpatialControl,
    _tpu_backend,
    attention,
    spacetime_cross_attention,
)
from ..ops.pallas_geglu import ff_win, geglu_ff


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding, cos-first (reference
    `diffusionmodules/util.py` timestep_embedding)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def norm_f32(norm, x):
    """Apply a normalization module in float32, cast back to x.dtype."""
    return norm(x.astype(jnp.float32)).astype(x.dtype)


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in float32 (reference GroupNorm32 /
    `attention.py:81-82`)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gn = nn.GroupNorm(num_groups=32, epsilon=self.epsilon, dtype=jnp.float32)
        return gn(x.astype(jnp.float32)).astype(x.dtype)


class _DenseParams(nn.Module):
    """Parameters of an nn.Dense (same initializers, same pytree paths —
    `{name}/kernel`, `{name}/bias`) without applying it; lets the fused
    GEGLU kernel consume raw weights while staying checkpoint-compatible
    with the nn.Dense formulation."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return kernel, bias


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP (reference `attention.py:42-66`): proj to 2×(4·dim), gate
    with gelu, project back.  fused=True routes winning geometries through
    the single-pallas_call kernel (ops/pallas_geglu.py) — the gated
    [M, inner] intermediate never touches HBM and the residual add fuses
    into the final store."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, residual=None):
        inner = self.dim * self.mult
        w1, b1 = _DenseParams(inner * 2, name="proj_in")(x.shape[-1])
        w2, b2 = _DenseParams(self.dim, name="proj_out")(inner)
        M = math.prod(x.shape[:-1])
        if self.fused and _tpu_backend() and ff_win(M, self.dim, inner):
            dt = self.dtype
            res = None if residual is None else residual.astype(dt)
            return geglu_ff(x.astype(dt), w1.astype(dt), b1.astype(dt),
                            w2.astype(dt), b2.astype(dt), res)
        # plain path — exactly nn.Dense(dtype=self.dtype) semantics
        dt = self.dtype
        h = jnp.dot(x.astype(dt), w1.astype(dt)) + b1.astype(dt)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.gelu(gate, approximate=False)
        out = jnp.dot(h, w2.astype(dt)) + b2.astype(dt)
        return out if residual is None else out + residual


class CrossAttention(nn.Module):
    """QKV projections + attention; no bias on q/k/v, bias on out
    (reference `attention.py:157-215`)."""

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dtype: jnp.dtype = jnp.float32
    flash: bool = False
    mha: bool = False
    fused_control: bool = False
    q_chunk: int = 0
    scores_dtype: Optional[jnp.dtype] = None

    def setup(self):
        inner = self.query_dim
        self.to_q = nn.Dense(inner, use_bias=False, dtype=self.dtype)
        self.to_k = nn.Dense(inner, use_bias=False, dtype=self.dtype)
        self.to_v = nn.Dense(inner, use_bias=False, dtype=self.dtype)
        self.to_out = nn.Dense(self.query_dim, dtype=self.dtype)

    def _qkv(self, x, context):
        """Project q/k/v and pin their shardings: batch on 'data', inner on
        'model' (column-parallel projections).  The pin matters twice over:
        (a) under TP it is the Megatron layout, (b) under FSDP/ZeRO the
        *tangents* of these dots (jvp w.r.t. the feature-sharded kernels)
        otherwise inherit mixed feature shardings that GSPMD can only
        reconcile with involuntary full rematerialization at every attn2
        (sharding constraints are linear, so the pin carries to tangents).
        No mesh in trace context → identity (single-chip paths untouched)."""
        from ..ops.spmd import constrain

        q = constrain(self.to_q(x), "data", None, "model")
        k = constrain(self.to_k(context), "data", None, "model")
        v = constrain(self.to_v(context), "data", None, "model")
        return q, k, v

    def __call__(self, x, context=None):
        context = x if context is None else context
        q, k, v = self._qkv(x, context)
        out = attention(q, k, v, self.heads, flash=self.flash, mha=self.mha,
                        q_chunk=self.q_chunk, scores_dtype=self.scores_dtype)
        return self.to_out(out)

    def controlled(self, x, context, control: Optional[SpatialControl], radius: float):
        """Cross-attention with the spatial blend (cond rows only)."""
        q, k, v = self._qkv(x, context)
        local_kv = None
        if control is not None:
            from ..ops.spmd import constrain

            # [B, N, L, inner]: batch on 'data', inner on 'model' (column-
            # parallel to_k/to_v) — see ops/attention.py blend constraints
            lk = constrain(self.to_k(control.local_contexts),
                           "data", None, None, "model")
            lv = constrain(self.to_v(control.local_contexts),
                           "data", None, None, "model")
            local_kv = (lk, lv)
        out = spacetime_cross_attention(
            q, (k, v), local_kv, control, self.heads, radius,
            fused=self.fused_control,
        )
        return self.to_out(out)


class BasicTransformerBlock(nn.Module):
    """Self-attn → controlled cross-attn → GEGLU FF, pre-LN residuals
    (reference `attention.py:223-300`)."""

    dim: int
    heads: int
    radius: float = 0.2
    dtype: jnp.dtype = jnp.float32
    flash: bool = False
    mha: bool = False
    fused_control: bool = False
    fused_ff: bool = False
    q_chunk: int = 0
    scores_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, context=None, control: Optional[SpatialControl] = None):
        attn1 = CrossAttention(
            self.dim, heads=self.heads, dtype=self.dtype, flash=self.flash,
            mha=self.mha, q_chunk=self.q_chunk,
            scores_dtype=self.scores_dtype, name="attn1",
        )
        # context=None → the second attention is self-attention, exactly the
        # reference's unconditional-LDM configuration (`attention.py:161`
        # `context_dim = default(context_dim, query_dim)`; used by e.g.
        # lsun/ffhq configs and sampled by scripts/sample_diffusion.py)
        attn2 = CrossAttention(
            self.dim,
            context_dim=None if context is None else context.shape[-1],
            heads=self.heads, dtype=self.dtype,
            fused_control=self.fused_control,
            flash=self.flash if context is None else False,
            mha=self.mha if context is None else False,
            q_chunk=self.q_chunk if context is None else 0,
            scores_dtype=self.scores_dtype if context is None else None,
            name="attn2",
        )
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")
        norm3 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")
        x = attn1(norm_f32(norm1, x)) + x
        if context is None:
            x = attn2(norm_f32(norm2, x)) + x
        else:
            x = attn2.controlled(norm_f32(norm2, x), context, control, self.radius) + x
        x = GEGLUFeedForward(
            self.dim, dtype=self.dtype, fused=self.fused_ff, name="ff"
        )(norm_f32(norm3, x), residual=x)
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm → 1×1 proj_in → transformer blocks over (H·W) tokens →
    zero-init 1×1 proj_out, residual (reference `attention.py:303-346`)."""

    channels: int
    heads: int
    depth: int = 1
    radius: float = 0.2
    dtype: jnp.dtype = jnp.float32
    flash: bool = False
    mha: bool = False
    fused_control: bool = False
    fused_ff: bool = False
    q_chunk: int = 0
    scores_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, context, control=None):
        B, H, W, C = x.shape
        h = GroupNorm32(epsilon=1e-6, name="norm")(x)
        h = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, self.channels)
        for d in range(self.depth):
            h = BasicTransformerBlock(
                self.channels, self.heads, radius=self.radius,
                dtype=self.dtype, flash=self.flash, mha=self.mha,
                fused_control=self.fused_control, fused_ff=self.fused_ff,
                q_chunk=self.q_chunk,
                scores_dtype=self.scores_dtype, name=f"block_{d}",
            )(h, context, control)
        h = h.reshape(B, H, W, self.channels)
        h = nn.Conv(
            self.channels, (1, 1), kernel_init=nn.initializers.zeros,
            dtype=self.dtype, name="proj_out",
        )(h)
        return x + h


class ResBlock(nn.Module):
    """UNet residual block with timestep-embedding injection
    (reference `openaimodel.py` ResBlock)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    norm_barrier: bool = False

    @nn.compact
    def __call__(self, x, emb):
        # with norm_barrier, the normalized activation is materialized (one
        # cheap HBM round-trip) so the conv compiles as a clean conv fusion
        # instead of a GroupNorm-prologue conv running at ~50% MXU
        barrier = (jax.lax.optimization_barrier if self.norm_barrier
                   else (lambda v: v))
        h = GroupNorm32(name="in_norm")(x)
        h = barrier(nn.silu(h))
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="in_conv")(h)
        e = nn.Dense(self.out_channels, dtype=self.dtype, name="emb_proj")(
            nn.silu(emb)
        )
        h = h + e[:, None, None, :]
        h = GroupNorm32(name="out_norm")(h)
        h = barrier(nn.silu(h))
        h = nn.Conv(
            self.out_channels, (3, 3), kernel_init=nn.initializers.zeros,
            dtype=self.dtype, name="out_conv",
        )(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch Conv2d(stride=2, padding=1) pads (1,1); flax SAME would pad
        # (0,1) at stride 2 — must be explicit for weight parity
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2),
            padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(self.channels, (3, 3), dtype=self.dtype, name="conv")(x)
