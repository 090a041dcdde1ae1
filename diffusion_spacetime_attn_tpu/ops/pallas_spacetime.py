"""Fused Pallas TPU kernel for the blended spacetime cross-attention.

This is the kernel the SURVEY §7 table calls for: one pass computing, per
query block, the conditional global attention AND all N per-object local
attentions (each with its own softmax over its own 77-token context) and
applying the region-mask/coef blend in the epilogue:

    out = attn(q_c, Kc, Vc) + Σ_n m_n·c_n·(attn(q_c, Kn, Vn) − g_u)

versus the XLA path (`ops.attention.spacetime_cross_attention`) this avoids
materializing the [B, N, Lq, inner] local-attention tensor in HBM — the
locals live only as VMEM accumulators.

The kernel is forward-only; gradients (needed w.r.t. q and coef for the
temporal optimization) come from a custom VJP that recomputes through the
XLA reference implementation — exact, and the XLA path stays the permanent
correctness oracle (tests run the kernel in interpret mode on CPU against
it).

Contexts are padded to LK_PAD=128 keys (true length 77); padded keys are
masked to −∞ before each softmax.  Head dim stays unpadded — Mosaic pads
lanes internally.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LK_PAD = 128
NEG_INF = -1e30


def _kernel(coef_ref, q_ref, gu_ref, kc_ref, vc_ref, lk_ref, lv_ref, m_ref,
            out_ref, *, num_objects: int, kv_len: int, scale: float):
    """Grid: (B, H, Lq // blk_q).  Block shapes:
    q/gu/out [1, 1, blk_q, dh]; kc/vc [1, 1, LK_PAD, dh];
    lk/lv [1, N, 1, LK_PAD, dh]; m [1, N, blk_q]; coef (SMEM) [B, N] —
    the full array (TPU SMEM blocks must equal the array dims), indexed by
    the batch program id."""
    b = pl.program_id(0)
    q = q_ref[0, 0].astype(jnp.float32)           # [blk_q, dh]
    blk_q = q.shape[0]

    kv_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (blk_q, LK_PAD), 1) < kv_len
    )

    def attend(k, v):
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                  # [blk_q, LK_PAD]
        s = jnp.where(kv_mask, s, NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        return jax.lax.dot_general(
            p, v.astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # [blk_q, dh]

    out = attend(kc_ref[0, 0], vc_ref[0, 0])
    gu = gu_ref[0, 0].astype(jnp.float32)
    wsum = jnp.zeros((blk_q, 1), jnp.float32)
    for n in range(num_objects):
        w = (m_ref[0, n].astype(jnp.float32) * coef_ref[b, n])[:, None]
        loc = attend(lk_ref[0, n, 0], lv_ref[0, n, 0])
        out = out + w * loc
        wsum = wsum + w
    out = out - wsum * gu
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _pad_kv(x):
    """[..., Lk, dh] → [..., LK_PAD, dh] zero-padded."""
    pad = LK_PAD - x.shape[-2]
    if pad <= 0:
        return x[..., :LK_PAD, :]
    cfg = [(0, 0)] * (x.ndim - 2) + [(0, pad), (0, 0)]
    return jnp.pad(x, cfg)


def _forward(q_c, g_u, kc, vc, lk, lv, masks, coef, num_heads, interpret=False):
    """q_c/g_u: [B, Lq, inner]; kc/vc: [B, Lk, inner];
    lk/lv: [B, N, Lk, inner]; masks: [B, N, Lq]; coef: [B, N]
    → blended cond rows [B, Lq, inner]."""
    B, Lq, inner = q_c.shape
    N = lk.shape[1]
    kv_len = kc.shape[1]
    dh = inner // num_heads
    scale = dh ** -0.5
    blk_q = min(Lq, 512)

    def heads(x):  # [B, L, inner] -> [B, H, L, dh]
        return jnp.swapaxes(x.reshape(B, -1, num_heads, dh), 1, 2)

    qh, guh = heads(q_c), heads(g_u)
    kch, vch = _pad_kv(heads(kc)), _pad_kv(heads(vc))
    # locals: [B, N, Lk, inner] -> [B, N, H, LK_PAD, dh]
    lkh = _pad_kv(jnp.swapaxes(lk.reshape(B, N, -1, num_heads, dh), 2, 3))
    lvh = _pad_kv(jnp.swapaxes(lv.reshape(B, N, -1, num_heads, dh), 2, 3))

    grid = (B, num_heads, Lq // blk_q)
    out = pl.pallas_call(
        functools.partial(
            _kernel, num_objects=N, kv_len=kv_len, scale=scale
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, N), lambda b, h, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, blk_q, dh), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, blk_q, dh), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, LK_PAD, dh), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, LK_PAD, dh), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, N, 1, LK_PAD, dh), lambda b, h, i: (b, 0, h, 0, 0)),
            pl.BlockSpec((1, N, 1, LK_PAD, dh), lambda b, h, i: (b, 0, h, 0, 0)),
            pl.BlockSpec((1, N, blk_q), lambda b, h, i: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, 1, blk_q, dh), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct(qh.shape, q_c.dtype),
        interpret=interpret,
    )(coef.astype(jnp.float32), qh, guh, kch, vch, lkh, lvh,
      masks.astype(q_c.dtype))
    return jnp.swapaxes(out, 1, 2).reshape(B, Lq, inner)


def _xla_reference(q_c, g_u, kc, vc, lk, lv, masks, coef, num_heads):
    """Oracle (same math as ops.attention.spacetime_cross_attention's cond
    half, with g_u precomputed)."""
    from .attention import attention, multi_context_attention

    g_c = attention(q_c, kc, vc, num_heads)
    loc = multi_context_attention(q_c, lk, lv, num_heads)   # [B, N, Lq, inner]
    w = masks * coef[..., None]                              # [B, N, Lq]
    blend = jnp.einsum("bnq,bnqi->bqi", w.astype(loc.dtype), loc)
    return g_c + blend - jnp.sum(w, axis=1)[..., None].astype(g_u.dtype) * g_u


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_spacetime_attention(q_c, g_u, kc, vc, lk, lv, masks, coef, num_heads):
    return _forward(q_c, g_u, kc, vc, lk, lv, masks, coef, num_heads)


def _fwd(q_c, g_u, kc, vc, lk, lv, masks, coef, num_heads):
    out = _forward(q_c, g_u, kc, vc, lk, lv, masks, coef, num_heads)
    return out, (q_c, g_u, kc, vc, lk, lv, masks, coef)


def _bwd(num_heads, res, g):
    q_c, g_u, kc, vc, lk, lv, masks, coef = res
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, num_heads), q_c, g_u, kc, vc, lk, lv,
        masks, coef,
    )
    return vjp(g)


fused_spacetime_attention.defvjp(_fwd, _bwd)


def fused_spacetime_attention_interpret(q_c, g_u, kc, vc, lk, lv, masks, coef, num_heads):
    """Interpret-mode entry (CPU tests)."""
    return _forward(q_c, g_u, kc, vc, lk, lv, masks, coef, num_heads, interpret=True)
