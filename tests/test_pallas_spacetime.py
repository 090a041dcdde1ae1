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


def test_fused_control_through_sampling_chain():
    """use_fused_control end-to-end (interpret kernels): forward latents and
    grads-through-chain w.r.t. the coef schedule match the einsum path."""
    import dataclasses

    from diffusion_spacetime_attn_tpu.config import (
        CLIPTextConfig,
        PipelineConfig,
        SpaceTimeConfig,
        UNetConfig,
        VAEConfig,
    )
    from diffusion_spacetime_attn_tpu.ops import pallas_spacetime as ps
    from diffusion_spacetime_attn_tpu.ops.attention import SpatialControl
    from diffusion_spacetime_attn_tpu.pipeline.pipeline import StableDiffusion
    from diffusion_spacetime_attn_tpu.utils.testing import randomize_params

    of, ob = ps._forward, ps._backward
    ps._forward = lambda *a, **k: of(*a, interpret=True)
    ps._backward = lambda *a, **k: ob(*a, interpret=True)
    try:
        def build(fused):
            cfg = PipelineConfig(
                unet=UNetConfig(model_channels=32, channel_mult=(1, 2),
                                num_res_blocks=1, attention_resolutions=(1, 2),
                                num_heads=2, context_dim=16,
                                use_fused_control=fused),
                vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
                text_encoder=CLIPTextConfig(width=16, layers=2, heads=2,
                                            vocab_size=100, max_len=7),
                spacetime=SpaceTimeConfig(num_steps=3, latent_size=16,
                                          image_size=32, max_objects=2),
            )
            sd = StableDiffusion.create(cfg, jax.random.PRNGKey(0))
            return dataclasses.replace(
                sd,
                unet_params=randomize_params(sd.unet_params,
                                             jax.random.PRNGKey(1), scale=0.2),
                vae_params=randomize_params(sd.vae_params, jax.random.PRNGKey(2)),
                text_params=randomize_params(sd.text_params, jax.random.PRNGKey(3)),
            )

        sd_e, sd_f = build(False), build(True)
        cond = sd_e.encode_text(jnp.array([[1, 5, 9, 3, 2, 0, 99]], jnp.int32))
        uncond = sd_e.encode_text(jnp.array([[1, 2, 0, 0, 0, 0, 99]], jnp.int32))
        r = np.random.RandomState(0)
        B, N, S = 1, 2, 3
        ctrl = SpatialControl(
            local_contexts=jnp.array(r.randn(B, N, 7, 16), jnp.float32) * 0.1,
            centers=jnp.array([[[0.3, 0.4], [0.7, 0.6]]], jnp.float32),
            coef=jnp.full((B, N), 1.5), active=jnp.ones((B, N)))
        coefs = jnp.full((B, N, S), 1.5)
        xT = jax.random.normal(jax.random.PRNGKey(3), (B, 16, 16, 4))

        def run(sd, c):
            eps = sd.make_eps_fn(cond, uncond, 7.5, ctrl, c)
            z = sd.sample_from(eps, xT, "plms", remat=True)
            return jnp.sum(sd.decode_latents(z) ** 2)

        ve, vf = run(sd_e, coefs), run(sd_f, coefs)
        np.testing.assert_allclose(float(vf), float(ve), rtol=1e-4)
        ge = jax.grad(lambda c: run(sd_e, c))(coefs)
        gf = jax.grad(lambda c: run(sd_f, c))(coefs)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(ge),
                                   rtol=5e-2, atol=1e-4)
    finally:
        ps._forward, ps._backward = of, ob


def test_spmd_partitioning_no_allgather():
    """The fused control op partitions over the prompt batch under a data
    mesh (forward AND backward) — no all-gather, per-shard kernels."""
    import diffusion_spacetime_attn_tpu.ops.pallas_spacetime as ps
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    mesh = Mesh(np.array(devs[:8]).reshape(8), ("data",))
    args = make_inputs(B=8, N=2, Lq=128, inner=32, heads=2, seed=5)

    orig_f, orig_b = ps._forward, ps._backward
    ps._forward = lambda *a, **k: orig_f(*a, interpret=True)
    ps._backward = lambda *a, **k: orig_b(*a, interpret=True)
    try:
        def loss(q, coef):
            out = ps.fused_spacetime_attention(
                q, args[1], args[2], args[3], args[4], args[5], args[6],
                coef, 2)
            return jnp.sum(out ** 2)

        gfn = jax.grad(loss, argnums=(0, 1))
        want = gfn(args[0], args[7])

        row3 = NamedSharding(mesh, P("data", None, None))
        row2 = NamedSharding(mesh, P("data", None))
        qs = jax.device_put(args[0], row3)
        cs = jax.device_put(args[7], row2)
        jitted = jax.jit(gfn, in_shardings=(row3, row2),
                         out_shardings=(row3, row2))
        hlo = jitted.lower(qs, cs).compile().as_text()
        assert "all-gather" not in hlo and "all_gather" not in hlo
        got = jitted(qs, cs)
        for w, g in zip(want, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=1e-4, rtol=1e-4)
    finally:
        ps._forward, ps._backward = orig_f, orig_b
