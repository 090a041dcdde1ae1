"""Fused Pallas TPU kernel for the blended spacetime cross-attention.

This is the kernel the SURVEY §7 table calls for: one pass computing, per
query block, the conditional global attention AND all N per-object local
attentions (each with its own softmax over its own 77-token context) and
applying the region-mask/coef blend in the epilogue:

    out = attn(q_c, Kc, Vc) + Σ_n m_n·c_n·(attn(q_c, Kn, Vn) − g_u)

versus the XLA path (`ops.attention.spacetime_cross_attention`) this avoids
materializing the [B, N, Lq, inner] local-attention tensor in HBM — the
locals live only as VMEM accumulators.

The backward is a second fused Pallas kernel (`_bwd_kernel`): it recomputes
the softmaxes per query block (flash-attention-style, no stored
probabilities) and emits dq, dkc/dvc, dlk/dlv, and the per-object blend
dot-products T_n[q] = (loc_n[q] − g_u[q])·ḡ[q] from which dcoef/dmasks/dg_u
are cheap elementwise reductions outside.  Like the forward it never
materializes the [B, N, Lq, inner] local-attention tensor the XLA einsum
path stores for its backward — the win that lets the optimization chain
batch higher at large N·B.  The XLA path stays the permanent correctness
oracle (interpret-mode tests check every cotangent against jax.grad of it).

Contexts are padded to LK_PAD=128 keys (true length 77); padded keys are
masked to −∞ before each softmax.  Head dim stays unpadded — Mosaic pads
lanes internally.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning

from .spmd import batch_partition
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


def _bwd_kernel(coef_ref, q_ref, gu_ref, kc_ref, vc_ref, lk_ref, lv_ref,
                m_ref, g_ref,
                dq_ref, dkc_ref, dvc_ref, dlk_ref, dlv_ref, t_ref,
                *, num_objects: int, kv_len: int, scale: float):
    """Grid: (B, H, Lq // blk_q) — i innermost, so the dk/dv blocks (indexed
    by (b, h) only) stay resident in VMEM and accumulate across query
    blocks; they are zero-initialized at i == 0.

    Emits per-block:
      dq  [1,1,blk_q,dh]         (global + Σ_n local attention backwards)
      dkc/dvc [1,1,LK_PAD,dh]    (accumulated over i)
      dlk/dlv [1,N,1,LK_PAD,dh]  (accumulated over i)
      t   [1,1,N,blk_q]          T_n[q] = (loc_n[q] − g_u[q])·ḡ[q] per head
    dcoef, dmasks, dg_u are cheap reductions of t/masks/coef OUTSIDE.
    """
    b = pl.program_id(0)
    i = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)            # [blk_q, dh]
    gbar = g_ref[0, 0].astype(jnp.float32)         # [blk_q, dh] cotangent
    gu = gu_ref[0, 0].astype(jnp.float32)
    blk_q = q.shape[0]

    kv_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (blk_q, LK_PAD), 1) < kv_len
    )

    @pl.when(i == 0)
    def _init():
        dkc_ref[...] = jnp.zeros_like(dkc_ref)
        dvc_ref[...] = jnp.zeros_like(dvc_ref)
        dlk_ref[...] = jnp.zeros_like(dlk_ref)
        dlv_ref[...] = jnp.zeros_like(dlv_ref)

    def probs(k):
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(kv_mask, s, NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        return p / jnp.sum(p, axis=-1, keepdims=True)   # [blk_q, LK_PAD]

    def attn_bwd(k, v, dout):
        """Standard softmax-attention backward for one context.
        Returns (dq_partial, dk, dv, out) — out = p·v reused for T."""
        p = probs(k)
        out = jax.lax.dot_general(
            p, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [blk_q, dh]
        dv = jax.lax.dot_general(
            p, dout, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [LK_PAD, dh]
        dp = jax.lax.dot_general(
            dout, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [blk_q, LK_PAD]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [blk_q, dh]
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [LK_PAD, dh]
        return dq, dk, dv, out

    # global conditional attention: dout = ḡ
    dq, dkc, dvc, _ = attn_bwd(kc_ref[0, 0], vc_ref[0, 0], gbar)
    dkc_ref[0, 0] += dkc.astype(dkc_ref.dtype)
    dvc_ref[0, 0] += dvc.astype(dvc_ref.dtype)

    for n in range(num_objects):
        w = (m_ref[0, n].astype(jnp.float32) * coef_ref[b, n])[:, None]
        dq_n, dk_n, dv_n, loc_n = attn_bwd(
            lk_ref[0, n, 0], lv_ref[0, n, 0], w * gbar)
        dq = dq + dq_n
        dlk_ref[0, n, 0] += dk_n.astype(dlk_ref.dtype)
        dlv_ref[0, n, 0] += dv_n.astype(dlv_ref.dtype)
        # T_n[q] = (loc_n − g_u)·ḡ per query (head-partial; summed outside)
        t_ref[0, 0, n] = jnp.sum((loc_n - gu) * gbar, axis=-1).astype(
            t_ref.dtype)

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _backward(q_c, g_u, kc, vc, lk, lv, masks, coef, num_heads, g,
              interpret=False):
    """Fused backward.  Returns cotangents for every primal input."""
    B, Lq, inner = q_c.shape
    N = lk.shape[1]
    kv_len = kc.shape[1]
    dh = inner // num_heads
    scale = dh ** -0.5
    blk_q = min(Lq, 512)

    def heads(x):
        return jnp.swapaxes(x.reshape(B, -1, num_heads, dh), 1, 2)

    qh, guh, gh = heads(q_c), heads(g_u), heads(g)
    kch, vch = _pad_kv(heads(kc)), _pad_kv(heads(vc))
    lkh = _pad_kv(jnp.swapaxes(lk.reshape(B, N, -1, num_heads, dh), 2, 3))
    lvh = _pad_kv(jnp.swapaxes(lv.reshape(B, N, -1, num_heads, dh), 2, 3))

    grid = (B, num_heads, Lq // blk_q)
    f32 = jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct(qh.shape, f32),                       # dq
        jax.ShapeDtypeStruct(kch.shape, f32),                      # dkc
        jax.ShapeDtypeStruct(vch.shape, f32),                      # dvc
        jax.ShapeDtypeStruct(lkh.shape, f32),                      # dlk
        jax.ShapeDtypeStruct(lvh.shape, f32),                      # dlv
        jax.ShapeDtypeStruct((B, num_heads, N, Lq), f32),          # t
    )
    dq, dkc, dvc, dlk, dlv, t = pl.pallas_call(
        functools.partial(
            _bwd_kernel, num_objects=N, kv_len=kv_len, scale=scale
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, N), lambda b, h, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, blk_q, dh), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, blk_q, dh), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, LK_PAD, dh), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, LK_PAD, dh), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, N, 1, LK_PAD, dh), lambda b, h, i: (b, 0, h, 0, 0)),
            pl.BlockSpec((1, N, 1, LK_PAD, dh), lambda b, h, i: (b, 0, h, 0, 0)),
            pl.BlockSpec((1, N, blk_q), lambda b, h, i: (b, 0, i)),
            pl.BlockSpec((1, 1, blk_q, dh), lambda b, h, i: (b, h, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, blk_q, dh), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, LK_PAD, dh), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, LK_PAD, dh), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, N, 1, LK_PAD, dh), lambda b, h, i: (b, 0, h, 0, 0)),
            pl.BlockSpec((1, N, 1, LK_PAD, dh), lambda b, h, i: (b, 0, h, 0, 0)),
            pl.BlockSpec((1, 1, N, blk_q), lambda b, h, i: (b, h, 0, i)),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(coef.astype(jnp.float32), qh, guh, kch, vch, lkh, lvh,
      masks.astype(q_c.dtype), gh)

    def unheads(x, L):
        return jnp.swapaxes(x, 1, 2).reshape(B, L, inner)

    def unheads_local(x, L):
        # [B, N, H, LK_PAD, dh] → [B, N, L, inner]
        return jnp.swapaxes(x, 2, 3)[..., :L, :, :].reshape(B, N, L, inner)

    dq_c = unheads(dq, Lq).astype(q_c.dtype)
    dkc_o = unheads(dkc, LK_PAD)[:, :kv_len].astype(kc.dtype)
    dvc_o = unheads(dvc, LK_PAD)[:, :kv_len].astype(vc.dtype)
    dlk_o = unheads_local(dlk, kv_len).astype(lk.dtype)
    dlv_o = unheads_local(dlv, kv_len).astype(lv.dtype)

    # elementwise epilogues (tiny; fused by XLA):
    t_sum = jnp.sum(t, axis=1)                                   # [B, N, Lq]
    w = masks.astype(f32) * coef[..., None].astype(f32)          # [B, N, Lq]
    # dg_u = −(Σ_n w_n)[q] · ḡ[q]
    dg_u = (-jnp.sum(w, axis=1)[..., None] * g.astype(f32)).astype(g_u.dtype)
    dmasks = (coef[..., None].astype(f32) * t_sum).astype(masks.dtype)
    dcoef = jnp.sum(masks.astype(f32) * t_sum, axis=-1).astype(coef.dtype)
    return dq_c, dg_u, dkc_o, dvc_o, dlk_o, dlv_o, dmasks, dcoef


# SPMD: both pallas_calls are batch-parallel over B (per-prompt blend, no
# cross-batch terms), so under a GSPMD/Shardy data mesh each shard runs on
# its local prompts instead of the partitioner replicating the kernel
# behind an all-gather.  Partitioned at the _forward/_backward level so the
# head-split/pad reshapes stay local too.


_forward_p = custom_partitioning(
    # late-binding so tests (and debugging) can monkeypatch _forward to
    # interpret mode; interpret stays out of this wrapper's signature
    lambda q_c, g_u, kc, vc, lk, lv, masks, coef, num_heads: _forward(
        q_c, g_u, kc, vc, lk, lv, masks, coef, num_heads),
    static_argnums=(8,))
_forward_p.def_partition(
    partition=batch_partition(tuple(range(8)), lambda nh: (
        lambda *a: _forward(*a, nh))),
    sharding_rule=("b q1 q2, b q3 q4, b q5 q6, b q7 q8, b q9 qa qb, "
                   "b qc qd qe, b qf qg, b qh -> b q1 q2"))

_backward_p = custom_partitioning(
    lambda q_c, g_u, kc, vc, lk, lv, masks, coef, g, num_heads: _backward(
        q_c, g_u, kc, vc, lk, lv, masks, coef, num_heads, g),
    static_argnums=(9,))
_backward_p.def_partition(
    partition=batch_partition(tuple(range(9)), lambda nh: (
        lambda *a: _backward(*a[:8], nh, a[8])), n_results=8),
    sharding_rule=("b q1 q2, b q3 q4, b q5 q6, b q7 q8, b q9 qa qb, "
                   "b qc qd qe, b qf qg, b qh, b qi qj -> "
                   "b q1 q2, b q3 q4, b q5 q6, b q7 q8, b q9 qa qb, "
                   "b qc qd qe, b qf qg, b qh"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_spacetime_attention(q_c, g_u, kc, vc, lk, lv, masks, coef, num_heads):
    return _forward_p(q_c, g_u, kc, vc, lk, lv, masks, coef, num_heads)


def _fwd(q_c, g_u, kc, vc, lk, lv, masks, coef, num_heads):
    out = _forward_p(q_c, g_u, kc, vc, lk, lv, masks, coef, num_heads)
    return out, (q_c, g_u, kc, vc, lk, lv, masks, coef)


def _bwd(num_heads, res, g):
    q_c, g_u, kc, vc, lk, lv, masks, coef = res
    return _backward_p(q_c, g_u, kc, vc, lk, lv, masks, coef, g, num_heads)


fused_spacetime_attention.defvjp(_fwd, _bwd)


def fused_spacetime_attention_interpret(q_c, g_u, kc, vc, lk, lv, masks, coef, num_heads):
    """Interpret-mode entry (CPU tests)."""
    return _forward(q_c, g_u, kc, vc, lk, lv, masks, coef, num_heads, interpret=True)
