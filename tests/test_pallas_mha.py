"""Fused full-softmax MHA kernel (ops/pallas_mha.py) vs the XLA oracle.

Interpret-mode on CPU (same scheme as the splash test in test_attention.py).
Reference semantics: `ldm/modules/attention.py:180-196`.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_spacetime_attn_tpu.ops.attention import attention
from diffusion_spacetime_attn_tpu.ops.pallas_mha import (
    _pick_bq,
    mha_attention,
    mha_ok,
)


def _qkv(B, L, H, dh, dtype=jnp.float32, seed=0):
    r = np.random.RandomState(seed)
    mk = lambda s: jnp.asarray(r.randn(B, L, H * dh), dtype)
    return mk(0), mk(1), mk(2)


@pytest.mark.parametrize("dh,L", [(40, 256), (80, 128), (160, 64)])
def test_mha_forward_matches_xla(dh, L):
    """Forward parity at each SD head geometry (d=40/80/160 at levels
    0/1/2+mid of the v1 UNet)."""
    B, H = 2, 2
    q, k, v = _qkv(B, L, H, dh)
    want = attention(q, k, v, H)
    got = mha_attention(q, k, v, H, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_mha_bf16_matches_xla_bf16():
    B, H, L, dh = 2, 2, 256, 40
    q, k, v = _qkv(B, L, H, dh, jnp.bfloat16)
    want = attention(q, k, v, H)
    got = mha_attention(q, k, v, H, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2)


def test_mha_grads_match_xla():
    """dq/dk/dv through the custom VJP match grads of the XLA oracle."""
    B, H, L, dh = 1, 2, 64, 40
    q, k, v = _qkv(B, L, H, dh)
    cot = jnp.asarray(np.random.RandomState(9).randn(B, L, H * dh),
                      jnp.float32)

    def loss(fn):
        return lambda q_, k_, v_: jnp.sum(fn(q_, k_, v_) * cot)

    want = jax.grad(loss(lambda a, b, c: attention(a, b, c, H)),
                    argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss(lambda a, b, c: mha_attention(a, b, c, H,
                                                      interpret=True)),
                   argnums=(0, 1, 2))(q, k, v)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-4, rtol=1e-4)


def test_mha_multiblock_rows():
    """Lq spanning several query blocks: every block row gets the right
    slice (catches index-map bugs)."""
    B, H, L, dh = 1, 1, 512, 40
    q, k, v = _qkv(B, L, H, dh)
    want = attention(q, k, v, H)
    got = mha_attention(q, k, v, H, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_mha_ok_is_the_measured_win_envelope():
    """Routing envelope = where the kernel measured FASTER than XLA on a
    real v5e (docs/BENCHMARKS.md round-3 device-time table): level-1
    geometry wins 2.1x; level 0 (d=40 contraction padding) and the short
    level-2/mid sequences lose, so they stay on XLA."""
    # SD v1 at 512²: level 1 self-attention is the win region
    assert mha_ok(1024, 1024, 80)
    assert _pick_bq(1024, 1024, 80) == 512
    # measured-loss geometries are refused (stay on the XLA einsum path)
    assert not mha_ok(4096, 4096, 40)   # d=40 < 64: padding kills it
    assert not mha_ok(256, 256, 160)    # Lq < 1024: overheads dominate
    assert not mha_ok(64, 64, 160)
    # hard caps
    assert not mha_ok(4096, 4096, 512)
    assert not mha_ok(16384, 16384, 40)


def test_attention_mha_flag_falls_back_off_tpu():
    """attention(mha=True) on CPU routes to the dense path (identical)."""
    B, H, L, dh = 2, 2, 128, 40
    q, k, v = _qkv(B, L, H, dh)
    np.testing.assert_allclose(
        np.asarray(attention(q, k, v, H, mha=True)),
        np.asarray(attention(q, k, v, H)), atol=0, rtol=0)


def test_spmd_partitioning_no_allgather():
    """Under a GSPMD data mesh the kernel partitions over B*H instead of
    being replicated behind an all-gather."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from diffusion_spacetime_attn_tpu.ops.pallas_mha import _mha_bh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    mesh = Mesh(np.array(devs[:8]).reshape(8), ("data",))
    BH, L, d = 16, 128, 64
    r = np.random.RandomState(41)
    q = jnp.asarray(r.randn(BH, L, d), jnp.float32)
    k = jnp.asarray(r.randn(BH, L, d), jnp.float32)
    v = jnp.asarray(r.randn(BH, L, d), jnp.float32)

    def f(q, k, v):
        return _mha_bh(q, k, v, d ** -0.5, True)

    want = f(q, k, v)
    row = NamedSharding(mesh, P("data", None, None))
    args = tuple(jax.device_put(a, row) for a in (q, k, v))
    jitted = jax.jit(f, in_shardings=(row,) * 3, out_shardings=row)
    hlo = jitted.lower(*args).compile().as_text()
    assert "all-gather" not in hlo and "all_gather" not in hlo
    got = jitted(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
