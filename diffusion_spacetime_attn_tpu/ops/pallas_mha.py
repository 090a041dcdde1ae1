"""Fused full-softmax multi-head attention kernel for SD UNet shapes.

Profile-driven replacement for the XLA einsum attention path
(`ops/attention.py:attention`).  A trace of the vanilla pipeline (b8,
`scripts/profiler.py`, round 2) showed XLA's fusions far below roofline at
the UNet's mid sequence lengths:

  level 1 (Lq=Lk=1024, d_head=80):  QK^T 0.82 ms + PV 0.71 ms per block
      vs a ~0.35 ms MXU floor — ~14% of peak, 4.4x headroom
  level 0 (Lq=Lk=4096, d_head=40):  6.98 ms per block vs the 5.6 ms
      d=40-padding floor — 1.25x headroom
  cross-attention (Lk=77): ~3.5x over floor

Unlike the generic splash kernel (online softmax, carry state, masks)
this kernel exploits what is true for every SD attention site: the whole
K/V for one (batch, head) fits VMEM (Lk<=4096, d<=160 -> <=2 MB padded),
so each program computes one full-row-softmax query block with two plain
MXU dots and no cross-block carries, and the [L,L] score tensor never
touches HBM.

Semantics match `attention()` exactly: softmax in f32, probabilities cast
to the value dtype for the PV matmul, output cast to the query dtype.
Reference semantics: `ldm/modules/attention.py:180-196` (einsum -> softmax
-> einsum).  Differentiable via custom VJP (backward = the standard
attention cotangent einsums in XLA; the optimization chain keeps splash,
which has fused backward blocks).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning

from .spmd import batch_partition
from jax.experimental.pallas import tpu as pltpu


def mha_ok(Lq: int, Lk: int, dh: int) -> bool:
    """Shapes where the kernel measured FASTER than the XLA einsum path
    (device-time A/B on v5e, b16, docs/BENCHMARKS.md round-3 table):

      1024/d80 (SD level 1):  0.79 vs 1.69 ms  — 2.1× win
      4096/d40 (SD level 0):  9.45 vs 7.02 ms  — lose (d=40 contraction
          padding hits the kernel harder than XLA's fused bf16-scores path)
      256/d160, 64/d160:      lose (fixed overheads dominate tiny shapes)

    so the envelope is: sequence long enough to amortize (≥1024), head dim
    at least half the 128-lane contraction width, and the VMEM budget of
    _pick_bq satisfiable."""
    return (Lq >= 1024 and 64 <= dh <= 256 and Lk <= 8192
            and _pick_bq(Lq, Lk, dh) is not None)


def _pick_bq(Lq: int, Lk: int, dh: int):
    """Largest query block whose working set fits VMEM (~16 MB, leave slack
    for Mosaic double-buffering of the K/V blocks across grid rows).
    DSTA_MHA_BQ caps the block size (tuning knob)."""
    import os

    cap = int(os.environ.get("DSTA_MHA_BQ", "512"))
    dpad = max(dh, 128)  # lane padding
    for bq in (512, 256, 128, 64, 32, 16, 8):
        if bq > cap:
            continue
        if Lq % bq:
            continue
        # f32 scores + value-dtype probs (both scratch) + double-buffered
        # K/V blocks (bf16) + q/o blocks
        vmem = (bq * Lk * 4 + bq * Lk * 2
                + 2 * (2 * Lk * dpad * 2) + 4 * bq * dpad * 4)
        if vmem <= 12 * 1024 * 1024:
            return bq
    return None


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # q: [1, bq, d]; k/v: [1, Lk, d]; o: [1, bq, d]
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                            # [bq, Lk] f32
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v.dtype)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


def _mha_fwd_impl(q, k, v, scale: float, interpret: bool):
    BH, Lq, d = q.shape
    Lk = k.shape[1]
    bq = _pick_bq(Lq, Lk, d)
    if bq is None:
        raise ValueError(f"mha kernel: no viable query block for "
                         f"Lq={Lq}, Lk={Lk}, d={d} (check mha_ok first)")
    grid = (BH, Lq // bq)
    kern = functools.partial(_mha_kernel, scale=scale)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, Lk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, Lk, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Lq, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BH * Lq * Lk * d,
            bytes_accessed=2 * (2 * BH * Lq * d + 2 * BH * Lk * d),
            transcendentals=BH * Lq * Lk,
        ),
    )(q, k, v)


# SPMD: an un-annotated pallas_call is replicated under GSPMD/Shardy
# (all-gather + full-batch kernel on every chip).  The kernel is
# batch-parallel over B*H with nothing shared across rows, so declare it:
# all operands and the result shard on the leading dim, each shard runs
# the kernel on its local batch slice.
_mha_fwd_p = custom_partitioning(
    lambda q, k, v, scale, interpret: _mha_fwd_impl(q, k, v, scale,
                                                    interpret),
    static_argnums=(3, 4))


_mha_fwd_p.def_partition(
    partition=batch_partition((0, 1, 2), lambda scale, interp: (
        lambda q, k, v: _mha_fwd_impl(q, k, v, scale, interp))),
    sharding_rule="b q d, b k e, b l f -> b q d")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _mha_bh(q, k, v, scale: float, interpret: bool = False):
    """Attention on head-split tensors [B*H, L, d]."""
    return _mha_fwd_p(q, k, v, scale, interpret)


def _mha_bh_fwd(q, k, v, scale, interpret):
    return _mha_fwd_p(q, k, v, scale, interpret), (q, k, v)


def _mha_bh_bwd(scale, interpret, res, g):
    # Standard attention backward in XLA (recompute p).  Used only if a
    # caller differentiates the serving path; the optimization chain routes
    # self-attention through splash (fused backward blocks) instead.
    q, k, v = res
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    pv = p.astype(v.dtype)
    dv = jnp.einsum("bqk,bqd->bkd", pv, g, preferred_element_type=jnp.float32)
    dp = jnp.einsum("bqd,bkd->bqk", g, v, preferred_element_type=jnp.float32)
    dsoft = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (dsoft * scale).astype(q.dtype)
    dq = jnp.einsum("bqk,bkd->bqd", ds, k, preferred_element_type=jnp.float32)
    dk = jnp.einsum("bqk,bqd->bkd", ds, q, preferred_element_type=jnp.float32)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_mha_bh.defvjp(_mha_bh_fwd, _mha_bh_bwd)


def mha_attention(q, k, v, num_heads: int, *, out_dtype=None,
                  interpret: bool = False):
    """Drop-in for `attention()` on eligible shapes.

    q: [B, Lq, H*d]; k/v: [B, Lk, H*d] -> [B, Lq, H*d].  Full (non-causal)
    softmax per row, f32 softmax numerics, never materializes [B,H,Lq,Lk]
    in HBM.
    """
    B, Lq, inner = q.shape
    Lk = k.shape[1]
    d = inner // num_heads
    scale = d ** -0.5
    fold = lambda t, L: jnp.swapaxes(
        t.reshape(B, L, num_heads, d), 1, 2
    ).reshape(B * num_heads, L, d)
    o = _mha_bh(fold(q, Lq), fold(k, Lk), fold(v, Lk), scale, interpret)
    o = jnp.swapaxes(o.reshape(B, num_heads, Lq, d), 1, 2).reshape(B, Lq, inner)
    return o.astype(out_dtype or q.dtype)
