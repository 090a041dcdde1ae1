"""Attention ops: plain MHA and the spatial-control blended cross-attention.

This is the TPU-native redesign of the paper's core mechanism
(`ldm/modules/attention.py:268-300`).  The reference runs a Python loop over
objects, calling the cross-attention module once per object per block and
re-computing the unconditional row every time.  Here the per-object local
attentions are one batched einsum over a stacked context axis (each context
keeps its own softmax), and the region-masked blend is applied *before* the
output projection — exact, because the per-pixel mask broadcasts over
channels and therefore commutes with the channel-mixing linear, and the
projection bias cancels inside the (local − uncond) difference.

Semantics (per prompt, CFG pair (u, c), N objects, blend weights coef):

    g_u   = attn(q_u, ctx_uncond)
    g_c   = attn(q_c, ctx_cond)
    loc_i = attn(q_c, ctx_local_i)                  (i = 1..N)
    out_u = g_u
    out_c = g_c + Σ_i mask_i ⊙ coef_i · (loc_i − g_u)

which matches `attention.py:284-294` exactly (there stated post-projection).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .masks import flat_circular_mask
from .spmd import batch_partition, constrain


class SpatialControl(NamedTuple):
    """Per-prompt control state threaded through the UNet (pytree).

    Replaces the reference's filesystem side channel
    (`scripts/txt2img-gpt.py:320-323` / `attention.py:234,246`) and the
    t==981 lazy mask init (`attention.py:240`): everything is an explicit,
    fixed-shape operand.
    """

    local_contexts: jnp.ndarray  # [B, N, L, D] CLIP embeds of "a photo of <obj>"
    centers: jnp.ndarray         # [B, N, 2] (x, y) in [0,1]
    coef: jnp.ndarray            # [B, N] blend weights for this step
    active: jnp.ndarray          # [B, N] 1.0 = real object, 0.0 = padding


def _tpu_backend() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def flash_ok(Lq: int, Lk: int, dh: int) -> bool:
    """Shapes the Pallas TPU splash kernel handles profitably: long
    self-attention sequences, head_dim ≤ 128 (SD's 160-dim heads sit at tiny
    seq lengths where XLA wins anyway)."""
    return Lq == Lk and Lq >= 1024 and dh <= 128 and Lq % 512 == 0


def _splash_kernel(num_heads: int, Lq: int, Lk: int, interpret: bool = False):
    """Splash-attention kernel instance.  Built per call site: the instance
    is a pytree holding mask-layout arrays that belong to the enclosing trace,
    so it must not be cached across jit traces (tracer leak otherwise).
    interpret=True runs the Pallas interpreter (CPU tests of the TPU-gated
    path)."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    mask = sm.MultiHeadMask([sm.FullMask((Lq, Lk)) for _ in range(num_heads)])
    import os

    _bs = int(os.environ.get("DSTA_SPLASH_BLOCK", "1024"))
    # 1024 measured best on the spacetime chain (1.397 vs 1.419 s/prompt-epoch
    # at b4 DPM20 with 512)
    _bw = int(os.environ.get("DSTA_SPLASH_BWD_BLOCK", "1024"))
    bq, bkv = min(_bs, Lq), min(_bs, Lk)
    bwq = min(_bw, Lq)
    bs = sk.BlockSizes(
        block_q=bq, block_kv=bkv, block_kv_compute=min(512, Lk),
        # backward (dq/dkv) blocks — required for the custom VJP, which the
        # spacetime optimization differentiates through under remat
        block_q_dkv=bwq, block_kv_dkv=bkv,
        block_kv_dkv_compute=min(_bw, Lk),
        block_q_dq=bwq, block_kv_dq=bkv,
    )
    return sk.make_splash_mha_single_device(mask, block_sizes=bs,
                                            interpret=interpret)


def _splash_spmd_wanted() -> bool:
    """Mesh-driven selection of the SPMD splash wrapper.

    Default: use the SPMD wrapper whenever more than one device could
    participate (a Mesh with size>1 is in context, or the process sees >1
    devices) — an un-wrapped pallas_call under GSPMD is replicated behind
    an all-gather, silently voiding data-parallel chain scaling.
    DSTA_SPLASH_SPMD=1/0 force-overrides (the wrapper costs one extra
    splash forward in the backward, so single-chip chains keep the plain
    path and its measured numbers).
    """
    import os

    env = os.environ.get("DSTA_SPLASH_SPMD", "")
    if env == "1":
        return True
    if env == "0":
        return False
    from .spmd import ctx_mesh

    m = ctx_mesh()
    if m is not None:
        return m.size > 1
    try:
        return len(jax.devices()) > 1
    except Exception:
        return False


def _make_splash_spmd(num_heads, Lq, Lk, interpret):
    """SPMD-partitioned splash (mesh-driven; see _splash_spmd_wanted).

    Splash's custom VJP lives INSIDE the kernel and jax cannot
    differentiate through custom_partitioning — so this wraps splash in
    its own custom_vjp whose forward and backward are each a
    batch-partitioned unit.  custom_partitioning also rejects closure
    constants, and the splash kernel instance is a pytree holding
    mask-layout arrays — those leaves are passed as explicit replicated
    operands instead.  Cost: the backward re-runs the splash forward once
    (jax.vjp residual rebuild) — worth it only under a multi-chip mesh,
    where the alternative is GSPMD replicating the kernel behind an
    all-gather (no data-parallel scaling); single-chip chains keep the
    plain path and its measured numbers.
    """
    from jax.experimental.custom_partitioning import custom_partitioning

    kern = _splash_kernel(num_heads, Lq, Lk, interpret=interpret)
    leaves, treedef = jax.tree_util.tree_flatten(kern)

    def run_fwd(qh, kh, vh, *kleaves):
        k_obj = jax.tree_util.tree_unflatten(treedef, kleaves)
        return jax.vmap(k_obj)(qh, kh, vh)

    def run_grads(qh, kh, vh, g, *kleaves):
        _, vjp = jax.vjp(lambda a, b, c: run_fwd(a, b, c, *kleaves),
                         qh, kh, vh)
        return vjp(g)

    # operand factor strings: unique factors everywhere except the shared
    # batch factor on the row-sharded args and results
    def fresh_dims(rank, it, lead=None):
        parts = ([lead] if lead else []) + [f"z{next(it)}"
                                            for _ in range(rank - (1 if lead else 0))]
        return " ".join(parts)

    import itertools
    cnt = itertools.count()
    qd, kd, vd = (fresh_dims(4, cnt, "b") for _ in range(3))
    leaf_dims = [fresh_dims(jnp.ndim(l), cnt) for l in leaves]

    fwd_p = custom_partitioning(run_fwd)
    fwd_rule = ", ".join([qd, kd, vd] + leaf_dims) + f" -> {qd}"
    fwd_p.def_partition(
        partition=batch_partition((0, 1, 2), lambda: run_fwd),
        sharding_rule=fwd_rule)

    gd = fresh_dims(4, cnt, "b")
    grads_p = custom_partitioning(run_grads)
    grads_rule = (", ".join([qd, kd, vd, gd] + leaf_dims)
                  + f" -> {qd}, {kd}, {vd}")
    grads_p.def_partition(
        partition=batch_partition((0, 1, 2, 3), lambda: run_grads,
                                  n_results=3),
        sharding_rule=grads_rule)

    @jax.custom_vjp
    def splash_spmd(qh, kh, vh):
        return fwd_p(qh, kh, vh, *leaves)

    def _f(qh, kh, vh):
        return fwd_p(qh, kh, vh, *leaves), (qh, kh, vh)

    def _b(saved, g):
        return grads_p(*saved, g, *leaves)

    splash_spmd.defvjp(_f, _b)
    return splash_spmd


def flash_attention(q, k, v, num_heads: int, interpret: bool = False):
    """Pallas TPU splash attention on [B, L, H*Dh] tensors.

    Never materializes the [B,H,Lq,Lk] score tensor in HBM (blockwise online
    softmax in VMEM) — at SD level 0 (Lq=4096) that tensor is what caps the
    vanilla batch size on a 16 GB chip.  Numerics: bf16 inputs, f32 running
    max/sum inside the kernel (measured 1.8e-3 max|Δ| vs the f32-softmax XLA
    path on unit-normal inputs).  Differentiable (custom VJP in the kernel).
    """
    B, Lq, inner = q.shape
    dh = inner // num_heads
    qh = jnp.swapaxes(q.reshape(B, Lq, num_heads, dh), 1, 2) * (dh ** -0.5)
    kh = jnp.swapaxes(k.reshape(B, -1, num_heads, dh), 1, 2)
    vh = jnp.swapaxes(v.reshape(B, -1, num_heads, dh), 1, 2)
    if _splash_spmd_wanted():
        spmd = _make_splash_spmd(num_heads, Lq, k.shape[-2], interpret)
        out = spmd(qh.astype(kh.dtype), kh, vh)
    else:
        kern = _splash_kernel(num_heads, Lq, k.shape[-2], interpret=interpret)
        out = jax.vmap(kern)(qh.astype(kh.dtype), kh, vh)
    return jnp.swapaxes(out, 1, 2).reshape(B, Lq, inner)


def attention(q, k, v, num_heads: int, *, out_dtype=None, flash: bool = False,
              mha: bool = False, q_chunk: int = 0, scores_dtype=None):
    """Plain softmax attention.  q: [B, Lq, H*Dh], k/v: [B, Lk, H*Dh].

    Softmax is computed in float32 regardless of input dtype (numerics rule
    for bf16 TPU attention).  flash=True routes eligible shapes through the
    Pallas TPU flash kernel (fwd+bwd via its custom VJP).  mha=True routes
    eligible self-attention shapes through the fused full-softmax Pallas
    kernel (ops/pallas_mha.py) — faster than both XLA and splash at SD UNet
    geometries where the whole K/V fits VMEM; flash wins when both are set
    (the optimization chain needs splash's fused backward).  q_chunk>0 splits
    the query axis into chunks computed sequentially (lax.map): numerically
    identical (each query row's softmax sees the full key axis), but the f32
    score tensor shrinks from [B,H,Lq,Lk] to [B,H,q_chunk,Lk] — at SD level 0
    (Lq=Lk=4096) that is what otherwise caps the vanilla batch size at 7 on a
    16 GB chip.  Measured cost of the serialization: ~40% at B7/B8 vanilla —
    use it as a memory knob, not a speed knob.  scores_dtype=bfloat16 instead
    halves the materialized score buffers without serializing (softmax math
    still f32 via fused up/downcasts; accumulation f32).
    """
    B, Lq, inner = q.shape
    if flash and _tpu_backend() and flash_ok(Lq, k.shape[-2], inner // num_heads):
        return flash_attention(q, k, v, num_heads).astype(out_dtype or q.dtype)
    if mha and _tpu_backend() and Lq == k.shape[-2]:
        from .pallas_mha import mha_attention, mha_ok

        if mha_ok(Lq, Lq, inner // num_heads):
            return mha_attention(q, k, v, num_heads, out_dtype=out_dtype)
    if q_chunk and Lq > q_chunk and Lq % q_chunk == 0:
        nc = Lq // q_chunk
        qc = jnp.moveaxis(q.reshape(B, nc, q_chunk, inner), 1, 0)
        out = jax.lax.map(
            lambda qi: attention(qi, k, v, num_heads, out_dtype=out_dtype,
                                 scores_dtype=scores_dtype), qc
        )
        return jnp.moveaxis(out, 0, 1).reshape(B, Lq, inner)
    Lk = k.shape[-2]
    dh = inner // num_heads
    scale = dh ** -0.5
    qh = q.reshape(B, Lq, num_heads, dh)
    kh = k.reshape(B, Lk, num_heads, dh)
    vh = v.reshape(B, Lk, num_heads, dh)
    sim = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    # pin the score tensor (batch on 'data', heads on 'model') and the
    # attention output (inner on 'model'): under FSDP/ZeRO the to_out
    # kernel is feature-sharded, so the COTANGENT entering here in the
    # chain backward otherwise inherits mixed feature shardings that GSPMD
    # reconciles with involuntary full rematerialization at every attn1
    # softmax op (seen in the pure-FSDP data=8 spacetime dryrun; pins are
    # linear, so they anchor the transposed tangents too).  Under TP this
    # is the Megatron head-split layout; single-chip traces are untouched.
    sim = constrain(sim, "data", "model", None, None)
    if scores_dtype is not None and jnp.dtype(scores_dtype) != jnp.float32:
        # store the materialized score buffer narrow; the cast fuses into the
        # matmul epilogue and the f32 upcast into the softmax fusion
        sim = sim.astype(scores_dtype)
    attn = jax.nn.softmax(sim.astype(jnp.float32) * scale, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", attn.astype(vh.dtype), vh,
        preferred_element_type=jnp.float32,
    )
    out = out.reshape(B, Lq, inner)
    out = constrain(out, "data", None, "model")
    return out.astype(out_dtype or q.dtype)


def multi_context_attention(q, k, v, num_heads: int):
    """Attention of one query set against S stacked contexts, separate softmax
    per context.  q: [B, Lq, H*Dh]; k/v: [B, S, Lk, H*Dh] → [B, S, Lq, H*Dh]."""
    B, Lq, inner = q.shape
    S, Lk = k.shape[1], k.shape[2]
    dh = inner // num_heads
    scale = dh ** -0.5
    qh = q.reshape(B, Lq, num_heads, dh)
    kh = k.reshape(B, S, Lk, num_heads, dh)
    vh = v.reshape(B, S, Lk, num_heads, dh)
    sim = jnp.einsum("bqhd,bskhd->bshqk", qh, kh, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sim * scale, axis=-1)
    out = jnp.einsum(
        "bshqk,bskhd->bsqhd", attn.astype(vh.dtype), vh,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, S, Lq, inner).astype(q.dtype)


def spacetime_cross_attention(
    q: jnp.ndarray,              # [2B, Lq, inner] queries, rows [0:B]=uncond, [B:2B]=cond
    context_kv,                  # (k, v) each [2B, L, inner] from the CFG contexts
    local_kv,                    # (k, v) each [B, N, L, inner] or None
    control: Optional[SpatialControl],
    num_heads: int,
    radius: float,
    fused: bool = False,
):
    """Blended global+local cross-attention (pre-projection outputs).

    Returns [2B, Lq, inner].  With control=None this is plain cross-attention
    (the vanilla SD path, first-class unlike the reference's broken stock
    path `ddpm.py:1005`).  fused=True routes the cond half through the
    Pallas kernel (ops.pallas_spacetime) on TPU.
    """
    k, v = context_kv
    B = q.shape[0] // 2
    dim = int(round(q.shape[1] ** 0.5))

    if control is not None and fused and _tpu_backend():
        from .pallas_spacetime import fused_spacetime_attention

        g_u = attention(q[:B], k[:B], v[:B], num_heads)
        lk, lv = local_kv
        m = flat_circular_mask(control.centers, dim, radius, control.active)
        out_c = fused_spacetime_attention(
            q[B:], g_u, k[B:], v[B:], lk, lv, m, control.coef, num_heads
        )
        return jnp.concatenate([g_u, out_c], axis=0)

    g = attention(q, k, v, num_heads)  # [2B, Lq, inner]
    if control is None:
        return g

    q_c = q[B:]
    lk, lv = local_kv
    N = lk.shape[1]
    # [B, N, Lq, inner] — one softmax per (prompt, object)
    loc = multi_context_attention(q_c, lk, lv, num_heads)

    # [B, N, Lq] region masks, zeroed for padded objects
    m = flat_circular_mask(control.centers, dim, radius, control.active)
    w = m * control.coef[..., None]                     # [B, N, Lq]
    # pin the blend intermediates: batch on 'data', inner on 'model' (the
    # column-parallel to_q/to_k/to_v output sharding).  Without these GSPMD
    # propagates mixed shardings into the jvp of the blend einsum and falls
    # back to involuntary full rematerialization (replicate-then-reshard)
    # of the local tensors at every controlled attn2, every step.
    loc = constrain(loc, "data", None, None, "model")
    w = constrain(w, "data", None, None)
    g = constrain(g, "data", None, "model")
    g_u, g_c = g[:B], g[B:]
    blend = jnp.einsum(
        "bnq,bnqi->bqi", w.astype(loc.dtype), loc
    ) - jnp.sum(w, axis=1)[..., None].astype(g_u.dtype) * g_u
    blend = constrain(blend, "data", None, "model")
    return jnp.concatenate([g_u, g_c + blend], axis=0)
