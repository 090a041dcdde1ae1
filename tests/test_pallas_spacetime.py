"""Fused spacetime attention kernel vs the XLA oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_spacetime_attn_tpu.ops.pallas_spacetime import (
    _xla_reference,
    fused_spacetime_attention_interpret,
)


def make_inputs(B=1, N=3, Lq=512, Lk=77, inner=64, heads=4, seed=0):
    rng = np.random.RandomState(seed)
    f = lambda *s: jnp.array(rng.randn(*s), jnp.float32) * 0.3
    q_c, g_u = f(B, Lq, inner), f(B, Lq, inner)
    kc, vc = f(B, Lk, inner), f(B, Lk, inner)
    lk, lv = f(B, N, Lk, inner), f(B, N, Lk, inner)
    masks = jnp.array(rng.rand(B, N, Lq) < 0.3, jnp.float32)
    coef = jnp.array(rng.rand(B, N), jnp.float32) * 2
    return q_c, g_u, kc, vc, lk, lv, masks, coef


def test_kernel_matches_xla_oracle():
    args = make_inputs()
    got = fused_spacetime_attention_interpret(*args, 4)
    expect = _xla_reference(*args, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-5)


def test_kernel_multi_batch_heads():
    args = make_inputs(B=2, N=2, Lq=1024, inner=80, heads=8, seed=1)
    got = fused_spacetime_attention_interpret(*args, 8)
    expect = _xla_reference(*args, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-5)


def test_vjp_grads_match_xla():
    from diffusion_spacetime_attn_tpu.ops import pallas_spacetime as ps

    args = make_inputs(Lq=512, seed=2)

    # patch forward to interpret mode for CPU
    orig = ps._forward
    ps._forward = lambda *a, **k: orig(*a, interpret=True, **{kk: vv for kk, vv in k.items() if kk != "interpret"})
    try:
        def loss_fused(q, coef):
            out = ps.fused_spacetime_attention(
                q, args[1], args[2], args[3], args[4], args[5], args[6], coef, 4
            )
            return jnp.sum(out ** 2)

        def loss_xla(q, coef):
            out = ps._xla_reference(
                q, args[1], args[2], args[3], args[4], args[5], args[6], coef, 4
            )
            return jnp.sum(out ** 2)

        gq1, gc1 = jax.grad(loss_fused, argnums=(0, 1))(args[0], args[7])
        gq2, gc2 = jax.grad(loss_xla, argnums=(0, 1))(args[0], args[7])
        np.testing.assert_allclose(np.asarray(gq1), np.asarray(gq2), atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gc1), np.asarray(gc2), atol=1e-3, rtol=1e-3)
    finally:
        ps._forward = orig
