"""Fused GEGLU feed-forward kernel (ops/pallas_geglu.py) vs the XLA oracle.

Interpret-mode on CPU (same scheme as test_pallas_mha.py).
Reference semantics: `ldm/modules/attention.py:42-66` (GEGLU + FeedForward).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_spacetime_attn_tpu.models.layers import GEGLUFeedForward
from diffusion_spacetime_attn_tpu.ops.pallas_geglu import (
    _erf,
    _pick_blocks,
    _xla_ref,
    ff_ok,
    ff_win,
    geglu_ff,
)


def _inputs(M, dim, inner, dtype=jnp.float32, seed=0):
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.randn(M, dim), dtype)
    w1 = jnp.asarray(r.randn(dim, 2 * inner) * 0.05, dtype)
    b1 = jnp.asarray(r.randn(2 * inner) * 0.1, dtype)
    w2 = jnp.asarray(r.randn(inner, dim) * 0.05, dtype)
    b2 = jnp.asarray(r.randn(dim) * 0.1, dtype)
    res = jnp.asarray(r.randn(M, dim), dtype)
    return x, w1, b1, w2, b2, res


def test_erf_polynomial_matches_lax_erf():
    """The Eigen rational polynomial (Mosaic has no erf lowering) is
    f32-ulp-level accurate across the clamp range and saturates outside."""
    x = jnp.linspace(-8.0, 8.0, 20001, dtype=jnp.float32)
    got = _erf(x)
    want = jax.lax.erf(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize("M,dim", [(64, 320), (128, 640), (32, 1280)])
def test_forward_matches_xla(M, dim):
    """Forward parity at the three SD UNet FF widths (levels 0/1/2+mid)."""
    inner = dim * 4
    x, w1, b1, w2, b2, res = _inputs(M, dim, inner)
    want = _xla_ref(x, w1, b1, w2, b2, res)
    got = geglu_ff(x, w1, b1, w2, b2, res, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_forward_multitile_inner(monkeypatch):
    """nj > 1 (inner tiled across the grid): the f32 accumulator carries
    partial proj_out products across inner tiles (catches accumulation and
    index-map bugs in the streamed-weights path)."""
    monkeypatch.setenv("DSTA_FF_BN", "256")
    M, dim = 64, 320
    inner = dim * 4  # 1280 = 5 tiles of 256
    x, w1, b1, w2, b2, res = _inputs(M, dim, inner, seed=3)
    assert _pick_blocks(M, dim, inner)[1] == 256
    want = _xla_ref(x, w1, b1, w2, b2, res)
    got = geglu_ff(x, w1, b1, w2, b2, res, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_no_residual_is_zero_residual():
    M, dim = 32, 320
    inner = dim * 4
    x, w1, b1, w2, b2, _ = _inputs(M, dim, inner, seed=5)
    want = _xla_ref(x, w1, b1, w2, b2, jnp.zeros_like(x))
    got = geglu_ff(x, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_bf16_matches_xla_ref():
    M, dim = 64, 320
    inner = dim * 4
    x, w1, b1, w2, b2, res = _inputs(M, dim, inner, jnp.bfloat16, seed=7)
    want = _xla_ref(x, w1, b1, w2, b2, res)
    got = geglu_ff(x, w1, b1, w2, b2, res, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2)


def test_grads_match_xla_ref():
    """All six cotangents through the custom VJP equal grads of the plain
    formulation (the VJP IS jax.vjp of _xla_ref — this pins the wiring)."""
    M, dim = 16, 320
    inner = dim * 4
    x, w1, b1, w2, b2, res = _inputs(M, dim, inner, seed=9)
    cot = jnp.asarray(np.random.RandomState(11).randn(M, dim), jnp.float32)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) * cot)

    want = jax.grad(loss(_xla_ref), argnums=tuple(range(6)))(
        x, w1, b1, w2, b2, res)
    got = jax.grad(
        loss(lambda *a: geglu_ff(*a[:5], residual=a[5], interpret=True)),
        argnums=tuple(range(6)))(x, w1, b1, w2, b2, res)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-4, rtol=1e-4)


def test_leading_dims_folded():
    """[B, L, dim] inputs fold to [B*L, dim] and unfold."""
    B, L, dim = 2, 32, 320
    inner = dim * 4
    x, w1, b1, w2, b2, res = _inputs(B * L, dim, inner, seed=13)
    want = geglu_ff(x, w1, b1, w2, b2, res, interpret=True)
    got = geglu_ff(x.reshape(B, L, dim), w1, b1, w2, b2,
                   res.reshape(B, L, dim), interpret=True)
    np.testing.assert_allclose(np.asarray(got).reshape(B * L, dim),
                               np.asarray(want), atol=0, rtol=0)


def test_module_param_tree_is_dense_compatible():
    """GEGLUFeedForward(fused=True) creates the exact nn.Dense pytree
    (proj_in/proj_out × kernel/bias, same shapes) so every converter and
    checkpoint loads unchanged."""
    x = jnp.zeros((4, 8, 320))
    p_plain = GEGLUFeedForward(320).init(jax.random.PRNGKey(0), x)["params"]
    p_fused = GEGLUFeedForward(320, fused=True).init(
        jax.random.PRNGKey(0), x)["params"]
    flat_p = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), p_plain)
    flat_f = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), p_fused)
    assert flat_p == flat_f
    assert set(p_plain) == {"proj_in", "proj_out"}
    assert p_plain["proj_in"]["kernel"].shape == (320, 2560)
    assert p_plain["proj_out"]["kernel"].shape == (1280, 320)


def test_module_fused_flag_is_noop_on_cpu():
    """On a non-TPU backend the fused flag falls back to the plain path
    bit-exactly (the kernel itself is covered by the interpret tests)."""
    x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 320), jnp.float32)
    res = jnp.asarray(np.random.RandomState(2).randn(2, 16, 320), jnp.float32)
    m_plain = GEGLUFeedForward(320)
    m_fused = GEGLUFeedForward(320, fused=True)
    p = m_plain.init(jax.random.PRNGKey(0), x)
    a = m_plain.apply(p, x, residual=res)
    b = m_fused.apply(p, x, residual=res)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ff_win_envelope(monkeypatch):
    """Routing policy: measured-win dims (320+640, the whole-pipeline
    optimum), dim-1280 hard gate (A/B loss + Mosaic scoped-VMEM OOM),
    DSTA_FF_DIMS narrowing override."""
    monkeypatch.delenv("DSTA_FF_DIMS", raising=False)
    assert ff_win(4096 * 8, 320, 1280)          # level 0, b8
    assert ff_win(1024 * 8, 640, 2560)          # level 1, b8
    assert not ff_win(256 * 8, 1280, 5120)      # level 2/mid: hard-gated
    monkeypatch.setenv("DSTA_FF_DIMS", "320")
    assert not ff_win(1024 * 8, 640, 2560)
    monkeypatch.setenv("DSTA_FF_DIMS", "all")
    assert not ff_win(256 * 8, 1280, 5120)      # gate beats 'all'
    # an EXPLICIT dim list is authoritative and may admit dims > 640
    # (the experiment knob for re-probing the level-2 geometry)
    monkeypatch.setenv("DSTA_FF_DIMS", "320,1280")
    assert ff_win(256 * 8, 1280, 5120)
    assert ff_win(4096 * 8, 320, 1280)
    assert not ff_win(1024 * 8, 640, 2560)
    # infeasible rows (M not divisible by any block) stay off regardless
    monkeypatch.delenv("DSTA_FF_DIMS", raising=False)
    assert not ff_ok(7, 320, 1280)


def test_grads_multitile_bwd(monkeypatch):
    """dx backward kernel with nj > 1 (inner tiled): the f32 accumulator
    carries dx partials across inner tiles."""
    monkeypatch.setenv("DSTA_FF_BN", "256")
    monkeypatch.setenv("DSTA_FF_BWD_BN", "256")
    M, dim = 32, 320
    inner = dim * 4
    x, w1, b1, w2, b2, res = _inputs(M, dim, inner, seed=21)
    cot = jnp.asarray(np.random.RandomState(22).randn(M, dim), jnp.float32)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) * cot)

    want = jax.grad(loss(_xla_ref), argnums=tuple(range(6)))(
        x, w1, b1, w2, b2, res)
    got = jax.grad(
        loss(lambda *a: geglu_ff(*a[:5], residual=a[5], interpret=True)),
        argnums=tuple(range(6)))(x, w1, b1, w2, b2, res)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=2e-4)


def test_bwd_falls_back_when_no_blocking(monkeypatch):
    """M not divisible by any block: the VJP falls back to jax.vjp of the
    XLA formulation (still correct)."""
    M, dim = 24, 320  # 24 divides by 8 — force failure via BM cap
    monkeypatch.setenv("DSTA_FF_BWD_BM", "7")
    inner = dim * 4
    x, w1, b1, w2, b2, res = _inputs(M, dim, inner, seed=23)
    from diffusion_spacetime_attn_tpu.ops.pallas_geglu import _pick_blocks_bwd
    assert _pick_blocks_bwd(M, dim, inner) is None
    cot = jnp.asarray(np.random.RandomState(24).randn(M, dim), jnp.float32)
    want = jax.grad(lambda *a: jnp.sum(_xla_ref(*a) * cot),
                    argnums=0)(x, w1, b1, w2, b2, res)
    got = jax.grad(
        lambda *a: jnp.sum(geglu_ff(*a[:5], residual=a[5], interpret=True) * cot),
        argnums=0)(x, w1, b1, w2, b2, res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("picker_name", ["_pick_blocks", "_pick_blocks_bwd"])
def test_block_pickers_divide_and_fit(picker_name):
    """Every (bm, bn) the pickers return divides (M, inner) exactly and
    respects the 12 MB VMEM budget across the SD geometries and odd sizes."""
    import diffusion_spacetime_attn_tpu.ops.pallas_geglu as pg
    picker = getattr(pg, picker_name)
    for M in (8, 64, 4096, 4096 * 8, 4096 * 16, 1024 * 8, 256 * 8):
        for dim in (320, 640, 1280):
            inner = dim * 4
            blocks = picker(M, dim, inner)
            if blocks is None:
                continue
            bm, bn = blocks
            assert M % bm == 0 and inner % bn == 0
            # recompute the picker's own budget bound
            if picker_name == "_pick_blocks":
                vmem = (2 * bm * dim * 2 + 2 * 3 * dim * bn * 2
                        + 2 * bm * bn * 4 + bm * dim * 4 + 2 * bm * dim * 2)
            else:
                vmem = (2 * 2 * bm * dim * 2 + 2 * 3 * dim * bn * 2
                        + 3 * bm * bn * 4 + bm * dim * 4 + 2 * bm * dim * 2)
            assert vmem <= 12 * 1024 * 1024
    assert picker(7, 320, 1280) is None  # indivisible M


def test_spmd_partitioning_no_allgather():
    """Under a GSPMD data mesh the kernel partitions row-wise (weights
    replicated) instead of being replicated behind an all-gather — the
    failure mode for un-annotated pallas_calls that would silently void
    data-parallel scaling in mesh-sharded serving."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    mesh = Mesh(np.array(devs[:8]).reshape(8), ("data",))
    M, dim = 64, 320
    inner = dim * 4
    x, w1, b1, w2, b2, res = _inputs(M, dim, inner, seed=31)

    def f(x, w1, b1, w2, b2, res):
        return geglu_ff(x, w1, b1, w2, b2, res, interpret=True)

    want = f(x, w1, b1, w2, b2, res)
    row = NamedSharding(mesh, P("data", None))
    rep1 = lambda a: NamedSharding(mesh, P(*([None] * a.ndim)))
    args = (jax.device_put(x, row), jax.device_put(w1, rep1(w1)),
            jax.device_put(b1, rep1(b1)), jax.device_put(w2, rep1(w2)),
            jax.device_put(b2, rep1(b2)), jax.device_put(res, row))
    jitted = jax.jit(f, in_shardings=(row, rep1(w1), rep1(b1), rep1(w2),
                                      rep1(b2), row), out_shardings=row)
    hlo = jitted.lower(*args).compile().as_text()
    assert "all-gather" not in hlo and "all_gather" not in hlo
    got = jitted(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    # gradient path partitions too (dx kernel + DCE'd param einsums)
    cot = jnp.asarray(np.random.RandomState(32).randn(M, dim), jnp.float32)
    cot_s = jax.device_put(cot, row)

    def loss(x, w1, b1, w2, b2, res, cot):
        return jnp.sum(geglu_ff(x, w1, b1, w2, b2, res, interpret=True) * cot)

    gfn = jax.jit(jax.grad(loss, argnums=(0, 5)))
    gwant = jax.grad(loss, argnums=(0, 5))(x, w1, b1, w2, b2, res, cot)
    ggot = gfn(*args, cot_s)
    for w, g in zip(gwant, ggot):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-5, rtol=1e-5)


def test_fwd_raises_on_unblockable_direct_call(monkeypatch):
    """The DIRECT entry raises on an unblockable M (callers must gate on
    ff_ok/ff_win — a silent XLA fallback would quietly erase the measured
    win); the silent fallback exists only inside the per-shard partition
    lowering, where M/n_data may legitimately be unblockable."""
    monkeypatch.setenv("DSTA_FF_BM", "7")
    from diffusion_spacetime_attn_tpu.ops.pallas_geglu import (
        _ff_fwd_local,
        _pick_blocks,
    )
    M, dim = 24, 320
    inner = dim * 4
    assert _pick_blocks(M, dim, inner) is None
    x, w1, b1, w2, b2, res = _inputs(M, dim, inner, seed=43)
    with pytest.raises(ValueError, match="no viable blocks"):
        geglu_ff(x, w1, b1, w2, b2, res, interpret=True)
    # the per-shard lowering path (strict=False) falls back silently
    want = _xla_ref(x, w1, b1, w2, b2, res)
    got = _ff_fwd_local(x, w1, b1, w2, b2, res, True, strict=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
