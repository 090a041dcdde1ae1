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


def test_fused_backward_all_cotangents_match_xla():
    """The fused Pallas backward kernel must reproduce EVERY cotangent of
    the XLA oracle (dq, dg_u, dkc, dvc, dlk, dlv, dmasks, dcoef) — it is the
    production backward of the optimization chain."""
    from diffusion_spacetime_attn_tpu.ops import pallas_spacetime as ps

    for kwargs in (dict(Lq=512, seed=2),
                   dict(B=2, N=2, Lq=1024, inner=80, heads=8, seed=3)):
        heads = kwargs.pop("heads", 4)
        args = make_inputs(**kwargs)
        out = ps._xla_reference(*args, heads)
        g = jnp.array(np.random.RandomState(9).randn(*out.shape),
                      jnp.float32) * 0.1

        _, vjp = jax.vjp(lambda *a: ps._xla_reference(*a, heads), *args)
        expect = vjp(g)
        got = ps._backward(*args, heads, g, interpret=True)
        names = ["dq_c", "dg_u", "dkc", "dvc", "dlk", "dlv", "dmasks", "dcoef"]
        for name, a, b in zip(names, got, expect):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3,
                err_msg=f"{name} mismatch ({kwargs})")


def test_vjp_grads_match_xla():
    """End-to-end custom_vjp: jax.grad through the fused op (interpret
    forward + interpret backward) equals jax.grad through the oracle."""
    from diffusion_spacetime_attn_tpu.ops import pallas_spacetime as ps

    args = make_inputs(Lq=512, seed=2)

    # patch both passes to interpret mode for CPU
    orig_f, orig_b = ps._forward, ps._backward
    ps._forward = lambda *a, **k: orig_f(*a, interpret=True)
    ps._backward = lambda *a, **k: orig_b(*a, interpret=True)
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
        ps._forward, ps._backward = orig_f, orig_b
