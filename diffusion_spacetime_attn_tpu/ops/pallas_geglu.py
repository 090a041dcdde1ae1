"""Fused GEGLU feed-forward kernel (proj_in -> gelu-gate -> proj_out).

Profile-driven (scripts/analyze_trace.py, round 3): XLA runs the FF
`proj_out` matmuls at only 19-27% of MXU peak (`add_add_fusion` rows,
~11 ms of the 125 ms UNet step at b8) and round-trips the [M, 2*inner]
projection through HBM (336 MB per level-0 block at bf16).

This kernel computes the whole GEGLU MLP of the SD transformer block —

    h    = x @ W1[:, :inner] + b1[:inner]
    gate = x @ W1[:, inner:] + b1[inner:]
    out  = (h * gelu(gate)) @ W2 + b2 (+ residual)

— in one pallas_call: grid over (M tiles, inner tiles), the gated
intermediate lives only in VMEM, partial `out` contributions accumulate
in an f32 scratch across inner tiles, and the residual add is fused into
the final store.  gelu is the exact erf form (reference
`ldm/modules/attention.py:42-50` GEGLU; erf is a native TPU
transcendental).  Weights stream in (dim x bn) column blocks, so the
level-2 geometry (W1 = 1280x10240, 26 MB bf16) works without ever
holding a full weight matrix in VMEM.

Differentiable via custom VJP with a REAL fused dx backward kernel
(h/g recomputed per tile in VMEM, NT dots, f32 dx accumulator): the
spacetime chain differentiates the temporal coefficients only, so dx is
the sole hot-path cotangent; dW/db remain plain XLA einsums in the VJP
wrapper, DCE-pruned whenever params are frozen.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu

from .spmd import batch_partition


def _pick_blocks(M: int, dim: int, inner: int):
    """(bm, bn) whose working set fits VMEM, or None.

    Budget: x tile [bm,dim] (double-buffered) + three weight blocks
    (W1h/W1g [dim,bn], W2 [bn,dim], double-buffered across inner steps)
    + f32 h/gate scratch [bm,bn] + f32 accumulator [bm,dim].
    DSTA_FF_BM caps the row block (tuning knob).
    """
    cap = int(os.environ.get("DSTA_FF_BM", "512"))
    ncap = int(os.environ.get("DSTA_FF_BN", "2560"))
    for bm in (512, 256, 128, 64, 32, 16, 8):
        if bm > cap or M % bm:
            continue
        for bn in (2560, 2048, 1280, 1024, 640, 512, 256, 128, 64):
            if bn > ncap or bn > inner or inner % bn:
                continue
            vmem = (2 * bm * dim * 2          # x (double-buffered)
                    + 2 * 3 * dim * bn * 2    # W1h, W1g, W2 (double-buffered)
                    + 2 * bm * bn * 4         # h, gate f32
                    + bm * dim * 4            # accumulator
                    + 2 * bm * dim * 2)       # out + residual
            if vmem <= 12 * 1024 * 1024:
                return bm, bn
    return None


def ff_ok(M: int, dim: int, inner: int) -> bool:
    return _pick_blocks(M, dim, inner) is not None


def ff_win(M: int, dim: int, inner: int) -> bool:
    """Shapes where routing the FF through the kernel WINS the
    whole-pipeline A/B (bench.py vanilla PLMS50 b8 on v5e, round 3):

      XLA FF            76.67 img/min
      fused dim 320     78.90   (+2.9%)
      fused dim 320+640 80.29   (+4.7%)  <- default envelope

    dim 1280 (level 2 + mid) is gated off by default: it lost the isolated
    scan A/B (small M can't hide the streamed 26 MB weights) AND its
    auto-picked blocking hit Mosaic's 16 MB scoped-VMEM limit at M=4096.
    DSTA_FF_DIMS overrides the allowlist for experiments: a comma-separated
    explicit dim list is authoritative (and may admit dims > 640, combined
    with DSTA_FF_BM/DSTA_FF_BN to force smaller tiles); 'all' means every
    dim <= 640 (the measured-win envelope)."""
    env = os.environ.get("DSTA_FF_DIMS", "").strip()
    if env and env != "all":
        allowed = {int(s) for s in env.split(",") if s.strip()}
        if dim not in allowed:
            return False
    elif dim > 640:
        return False
    return ff_ok(M, dim, inner)


def _erf(x):
    """f32 erf for the kernel body: Mosaic has no erf lowering, so this is
    the Eigen `generic_fast_erf_float` rational polynomial (the same
    approximation XLA:CPU lowers erf to).  Validated against jax.lax.erf
    over [-8, 8]: max abs error 6e-7 — f32-ulp level, invisible at the
    bf16 compute dtype (tests/test_pallas_geglu.py)."""
    x = jnp.clip(x, -3.925724883e00, 3.925724883e00)
    x2 = x * x
    a = jnp.float32(-2.72614225801306e-10)
    a = a * x2 + jnp.float32(2.77068142495902e-08)
    a = a * x2 + jnp.float32(-2.10102402082508e-06)
    a = a * x2 + jnp.float32(-5.69250639462346e-05)
    a = a * x2 + jnp.float32(-7.34990630326855e-04)
    a = a * x2 + jnp.float32(-2.95459980854025e-03)
    a = a * x2 + jnp.float32(-1.60960333262415e-02)
    a = a * x
    b = jnp.float32(-1.45660718464996e-05)
    b = b * x2 + jnp.float32(-2.13374055278905e-04)
    b = b * x2 + jnp.float32(-1.68282697438203e-03)
    b = b * x2 + jnp.float32(-7.37332916720468e-03)
    b = b * x2 + jnp.float32(-1.42647390514189e-02)
    return a / b


def _gelu_erf(x):
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _ff_kernel(x_ref, w1h_ref, w1g_ref, b1h_ref, b1g_ref, w2_ref, b2_ref,
               *rest, nj: int, has_res: bool):
    # rest = (res_ref,)? + (o_ref, acc_ref) — res is a real operand only
    # when the caller passes a residual (no zeros streamed otherwise)
    res_ref = rest[0] if has_res else None
    o_ref, acc_ref = rest[-2], rest[-1]
    j = pl.program_id(1)
    x = x_ref[...]
    h = jax.lax.dot_general(
        x, w1h_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1h_ref[...]
    g = jax.lax.dot_general(
        x, w1g_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1g_ref[...]
    u = (h * _gelu_erf(g)).astype(x.dtype)
    part = jax.lax.dot_general(
        u, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _():
        acc_ref[...] += part

    @pl.when(j == nj - 1)
    def _():
        out = acc_ref[...] + b2_ref[...]
        if has_res:
            out = out + res_ref[...].astype(jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)


def _ff_fwd_local(x, w1, b1, w2, b2, res, interpret: bool,
                  strict: bool = True):
    """Single-shard pallas_call.  strict=True (the direct entry) raises on
    an unblockable M — callers must gate on ff_ok/ff_win, and a silent XLA
    fallback there would quietly erase the kernel's measured win.
    strict=False (the per-shard partition lowering, where M/n_data may
    legitimately be unblockable) falls back to the XLA formulation."""
    M, dim = x.shape
    inner = w2.shape[0]
    blocks = _pick_blocks(M, dim, inner)
    if blocks is None:
        if strict:
            raise ValueError(f"geglu kernel: no viable blocks for M={M}, "
                             f"dim={dim}, inner={inner} (check ff_ok first)")
        return _xla_ref(x, w1, b1, w2, b2, res)
    bm, bn = blocks
    nj = inner // bn
    w1h, w1g = w1[:, :inner], w1[:, inner:]
    b1h = b1[:inner].reshape(1, inner)
    b1g = b1[inner:].reshape(1, inner)
    b2r = b2.reshape(1, dim)
    has_res = res is not None
    kern = functools.partial(_ff_kernel, nj=nj, has_res=has_res)
    in_specs = [
        pl.BlockSpec((bm, dim), lambda i, j: (i, 0)),
        pl.BlockSpec((dim, bn), lambda i, j: (0, j)),
        pl.BlockSpec((dim, bn), lambda i, j: (0, j)),
        pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        pl.BlockSpec((bn, dim), lambda i, j: (j, 0)),
        pl.BlockSpec((1, dim), lambda i, j: (0, 0)),
    ]
    operands = [x, w1h, w1g, b1h, b1g, w2, b2r]
    if has_res:
        in_specs.append(pl.BlockSpec((bm, dim), lambda i, j: (i, 0)))
        operands.append(res)
    return pl.pallas_call(
        kern,
        grid=(M // bm, nj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, dim), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, dim), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, dim), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * dim * inner * 3,
            bytes_accessed=2 * (3 * M * dim + 3 * dim * inner),
            transcendentals=M * inner,
        ),
    )(*operands)


def _pick_blocks_bwd(M: int, dim: int, inner: int):
    """(bm, bn) for the dx backward kernel, or None.

    Budget: x + dy tiles [bm,dim] (double-buffered) + three weight blocks
    (W1h/W1g [dim,bn], W2 [bn,dim], double-buffered) + f32 h/g/du scratch
    [bm,bn] + f32 dx accumulator [bm,dim]."""
    cap = int(os.environ.get("DSTA_FF_BWD_BM", "512"))
    ncap = int(os.environ.get("DSTA_FF_BWD_BN", "2560"))
    for bm in (512, 256, 128, 64, 32, 16, 8):
        if bm > cap or M % bm:
            continue
        for bn in (2560, 2048, 1280, 1024, 640, 512, 256, 128, 64):
            if bn > ncap or bn > inner or inner % bn:
                continue
            vmem = (2 * 2 * bm * dim * 2      # x, dy (double-buffered)
                    + 2 * 3 * dim * bn * 2    # W1h, W1g, W2 (double-buffered)
                    + 3 * bm * bn * 4         # h, g, du f32
                    + bm * dim * 4            # dx accumulator
                    + 2 * bm * dim * 2)       # dx out (double-buffered)
            if vmem <= 12 * 1024 * 1024:
                return bm, bn
    return None


_INV_SQRT2 = 2.0 ** -0.5
_INV_SQRT2PI = 0.3989422804014327


def _ff_bwd_kernel(x_ref, dy_ref, w1h_ref, w1g_ref, b1h_ref, b1g_ref,
                   w2_ref, dx_ref, acc_ref, *, nj: int):
    """dx of the GEGLU MLP, h/g recomputed per tile in VMEM.

    The chain use-case (spacetime optimization) differentiates w.r.t. the
    temporal coefficients only — params are frozen — so dx is the ONLY
    cotangent on the hot path; dW/db stay as (DCE-prunable) XLA einsums in
    the VJP wrapper."""
    j = pl.program_id(1)
    x = x_ref[...]
    dy = dy_ref[...]
    h = jax.lax.dot_general(
        x, w1h_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1h_ref[...]
    g = jax.lax.dot_general(
        x, w1g_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1g_ref[...]
    # du = dy @ W2^T, NT form: contract the shared `dim` axis
    du = jax.lax.dot_general(
        dy, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    c = 0.5 * (1.0 + _erf(g * _INV_SQRT2))           # gelu(g)/g
    phi = jnp.exp(-0.5 * g * g) * _INV_SQRT2PI        # N(0,1) pdf
    dh = (du * (g * c)).astype(x.dtype)               # du * gelu(g)
    dg = (du * (h * (c + g * phi))).astype(x.dtype)   # du * h * gelu'(g)
    # dx partial = dh @ W1h^T + dg @ W1g^T (NT: contract the bn axis)
    part = jax.lax.dot_general(
        dh, w1h_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        dg, w1g_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _():
        acc_ref[...] += part

    @pl.when(j == nj - 1)
    def _():
        dx_ref[...] = acc_ref[...].astype(dx_ref.dtype)


def _xla_dx(x, w1, b1, w2, dy):
    """Plain-XLA dx (used when no backward blocking fits the local M)."""
    inner = w2.shape[0]
    gf = dy.astype(jnp.float32)
    h = (jnp.dot(x, w1[:, :inner], preferred_element_type=jnp.float32)
         + b1[:inner])
    g = (jnp.dot(x, w1[:, inner:], preferred_element_type=jnp.float32)
         + b1[inner:])
    c = 0.5 * (1.0 + _erf(g * _INV_SQRT2))
    phi = jnp.exp(-0.5 * g * g) * _INV_SQRT2PI
    du = jnp.dot(gf, w2.T.astype(jnp.float32),
                 preferred_element_type=jnp.float32)
    dh = (du * (g * c)).astype(x.dtype)
    dg = (du * (h * (c + g * phi))).astype(x.dtype)
    return (jnp.dot(dh, w1[:, :inner].T, preferred_element_type=jnp.float32)
            + jnp.dot(dg, w1[:, inner:].T,
                      preferred_element_type=jnp.float32)).astype(x.dtype)


def _ff_dx_local(x, w1, b1, w2, dy, interpret: bool):
    M, dim = x.shape
    inner = w2.shape[0]
    blocks = _pick_blocks_bwd(M, dim, inner)
    if blocks is None:
        return _xla_dx(x, w1, b1, w2, dy)
    bm, bn = blocks
    nj = inner // bn
    w1h, w1g = w1[:, :inner], w1[:, inner:]
    b1h = b1[:inner].reshape(1, inner)
    b1g = b1[inner:].reshape(1, inner)
    kern = functools.partial(_ff_bwd_kernel, nj=nj)
    return pl.pallas_call(
        kern,
        grid=(M // bm, nj),
        in_specs=[
            pl.BlockSpec((bm, dim), lambda i, j: (i, 0)),   # x
            pl.BlockSpec((bm, dim), lambda i, j: (i, 0)),   # dy
            pl.BlockSpec((dim, bn), lambda i, j: (0, j)),   # W1h
            pl.BlockSpec((dim, bn), lambda i, j: (0, j)),   # W1g
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),     # b1h
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),     # b1g
            pl.BlockSpec((bn, dim), lambda i, j: (j, 0)),   # W2
        ],
        out_specs=pl.BlockSpec((bm, dim), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, dim), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, dim), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * dim * inner * 5,
            bytes_accessed=2 * (4 * M * dim + 3 * dim * inner),
            transcendentals=2 * M * inner,
        ),
    )(x, dy, w1h, w1g, b1h, b1g, w2)


def _xla_ref(x, w1, b1, w2, b2, res=None):
    """The un-fused formulation (matches models/layers.py
    GEGLUFeedForward + residual); used for the VJP fallback and as test
    oracle.  res=None (an empty pytree to jax) skips the residual add."""
    inner = w2.shape[0]
    h = (jnp.dot(x, w1[:, :inner], preferred_element_type=jnp.float32)
         + b1[:inner])
    g = (jnp.dot(x, w1[:, inner:], preferred_element_type=jnp.float32)
         + b1[inner:])
    u = (h * _gelu_erf(g)).astype(x.dtype)
    out = jnp.dot(u, w2, preferred_element_type=jnp.float32) + b2
    if res is not None:
        out = out + res.astype(jnp.float32)
    return out.astype(x.dtype)


def _param_and_dx_cotangents(x, w1, b1, w2, b2, gy, interpret):
    """Shared backward math.  dx through the fused Pallas backward kernel
    (h/g recomputed in VMEM); dW/db as plain XLA einsums that XLA's DCE
    prunes whenever the params are frozen — which is the whole spacetime
    optimization chain (grads flow to the temporal coefficients only,
    reference `plms.py:204-293`).  dx falls back to the XLA formulation
    when no backward blocking fits."""
    M, dim = x.shape
    inner = w2.shape[0]
    gf = gy.astype(jnp.float32)
    h = (jnp.dot(x, w1[:, :inner], preferred_element_type=jnp.float32)
         + b1[:inner])
    g = (jnp.dot(x, w1[:, inner:], preferred_element_type=jnp.float32)
         + b1[inner:])
    c = 0.5 * (1.0 + _erf(g * _INV_SQRT2))
    phi = jnp.exp(-0.5 * g * g) * _INV_SQRT2PI
    u = (h * (g * c)).astype(x.dtype)
    du = jnp.dot(gf, w2.T.astype(jnp.float32),
                 preferred_element_type=jnp.float32)
    dh = du * (g * c)
    dg = du * (h * (c + g * phi))
    dx = _ff_dx_p(x, w1, b1, w2, gy, interpret)
    dw2 = jnp.dot(u.T, gf, preferred_element_type=jnp.float32).astype(w2.dtype)
    db2 = jnp.sum(gf, axis=0).astype(b2.dtype)
    dw1 = jnp.concatenate([
        jnp.dot(x.T, dh.astype(x.dtype), preferred_element_type=jnp.float32),
        jnp.dot(x.T, dg.astype(x.dtype), preferred_element_type=jnp.float32),
    ], axis=1).astype(w1.dtype)
    db1 = jnp.concatenate([jnp.sum(dh, 0), jnp.sum(dg, 0)]).astype(b1.dtype)
    return dx, dw1, db1, dw2, db2


# --- SPMD partitioning -----------------------------------------------------
# Under a GSPMD/Shardy mesh an un-annotated pallas_call is replicated (the
# partitioner inserts an all-gather and every chip runs the full batch).
# All three kernels are row-parallel over M = folded batch·L with weights
# broadcast, so declare exactly that: batch-rowed operands keep their row
# sharding, weights/biases are replicated, each shard runs the kernel on
# its local rows.  The local lowering re-picks blocks for the per-shard M
# and falls back to the XLA formulation if none fits.


_ff_fwd_res_p = custom_partitioning(
    lambda x, w1, b1, w2, b2, res, interpret: _ff_fwd_local(
        x, w1, b1, w2, b2, res, interpret),
    static_argnums=(6,))
_ff_fwd_res_p.def_partition(
    partition=batch_partition((0, 5), lambda interp: (
        lambda x, w1, b1, w2, b2, res: _ff_fwd_local(
            x, w1, b1, w2, b2, res, interp, strict=False))),
    sharding_rule="m d, a b, c, e f, g, m h -> m d")

_ff_fwd_nores_p = custom_partitioning(
    lambda x, w1, b1, w2, b2, interpret: _ff_fwd_local(
        x, w1, b1, w2, b2, None, interpret),
    static_argnums=(5,))
_ff_fwd_nores_p.def_partition(
    partition=batch_partition((0,), lambda interp: (
        lambda x, w1, b1, w2, b2: _ff_fwd_local(
            x, w1, b1, w2, b2, None, interp, strict=False))),
    sharding_rule="m d, a b, c, e f, g -> m d")

_ff_dx_p = custom_partitioning(
    lambda x, w1, b1, w2, dy, interpret: _ff_dx_local(
        x, w1, b1, w2, dy, interpret),
    static_argnums=(5,))
_ff_dx_p.def_partition(
    partition=batch_partition((0, 4), lambda interp: (
        lambda x, w1, b1, w2, dy: _ff_dx_local(
            x, w1, b1, w2, dy, interp))),
    sharding_rule="m d, a b, c, e f, m h -> m d")


# Two wrappers (with / without residual) so the no-residual call neither
# streams a zeros operand through the kernel nor fabricates a cotangent.
# res is never saved as a VJP residual: it enters the forward linearly, so
# its cotangent is gy itself — saving it would keep an extra [M, dim]
# activation alive from forward to backward at every FF site.
@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _ff(x, w1, b1, w2, b2, res, interpret: bool = False):
    return _ff_fwd_res_p(x, w1, b1, w2, b2, res, interpret)


def _ff_vjp_fwd(x, w1, b1, w2, b2, res, interpret):
    out = _ff_fwd_res_p(x, w1, b1, w2, b2, res, interpret)
    return out, (x, w1, b1, w2, b2)


def _ff_vjp_bwd(interpret, saved, gy):
    cots = _param_and_dx_cotangents(*saved, gy, interpret)
    return (*cots, gy)


_ff.defvjp(_ff_vjp_fwd, _ff_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _ff_nores(x, w1, b1, w2, b2, interpret: bool = False):
    return _ff_fwd_nores_p(x, w1, b1, w2, b2, interpret)


def _ff_nores_vjp_fwd(x, w1, b1, w2, b2, interpret):
    out = _ff_fwd_nores_p(x, w1, b1, w2, b2, interpret)
    return out, (x, w1, b1, w2, b2)


def _ff_nores_vjp_bwd(interpret, saved, gy):
    return _param_and_dx_cotangents(*saved, gy, interpret)


_ff_nores.defvjp(_ff_nores_vjp_fwd, _ff_nores_vjp_bwd)


def geglu_ff(x, w1, b1, w2, b2, residual=None, *, interpret: bool = False):
    """Fused GEGLU MLP.  x: [..., L, dim]; w1: [dim, 2*inner];
    b1: [2*inner]; w2: [inner, dim]; b2: [dim].  residual (same shape as
    x) is added into the output inside the kernel when given; without it
    no zeros are streamed — the add is compiled out."""
    shape = x.shape
    dim = shape[-1]
    x2 = x.reshape(-1, dim)
    if residual is None:
        out = _ff_nores(x2, w1, b1, w2, b2, interpret)
    else:
        res = residual.reshape(-1, dim).astype(x.dtype)
        out = _ff(x2, w1, b1, w2, b2, res, interpret)
    return out.reshape(shape)
