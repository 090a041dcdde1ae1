import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_spacetime_attn_tpu.config import UNetConfig
from diffusion_spacetime_attn_tpu.models.unet import UNet
from diffusion_spacetime_attn_tpu.ops.attention import SpatialControl
from diffusion_spacetime_attn_tpu.utils.testing import randomize_params

TINY = UNetConfig(
    model_channels=32,
    channel_mult=(1, 2),
    num_res_blocks=1,
    attention_resolutions=(1, 2),
    num_heads=2,
    context_dim=16,
)


@pytest.fixture(scope="module")
def unet_and_params():
    unet = UNet(TINY, radius=0.2)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 7, 16))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    # SD zero-inits its output convs — randomize so outputs are non-degenerate
    params = randomize_params(params, jax.random.PRNGKey(1))
    return unet, params


def test_shapes_and_finite(unet_and_params):
    unet, params = unet_and_params
    rng = np.random.RandomState(0)
    x = jnp.array(rng.randn(2, 16, 16, 4), jnp.float32)
    t = jnp.array([981, 981], jnp.int32)
    ctx = jnp.array(rng.randn(2, 7, 16), jnp.float32)
    out = unet.apply({"params": params}, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_control_preserves_uncond_and_zero_coef(unet_and_params):
    unet, params = unet_and_params
    rng = np.random.RandomState(1)
    B = 1
    x = jnp.array(rng.randn(2 * B, 16, 16, 4), jnp.float32)
    t = jnp.array([981] * 2 * B, jnp.int32)
    ctx = jnp.array(rng.randn(2 * B, 7, 16), jnp.float32)
    local = jnp.array(rng.randn(B, 2, 7, 16), jnp.float32)
    centers = jnp.array([[[0.3, 0.4], [0.7, 0.6]]], jnp.float32)
    active = jnp.ones((B, 2))

    vanilla = unet.apply({"params": params}, x, t, ctx)
    zero = unet.apply(
        {"params": params}, x, t, ctx,
        SpatialControl(local, centers, jnp.zeros((B, 2)), active),
    )
    np.testing.assert_allclose(np.asarray(zero), np.asarray(vanilla), atol=1e-4)

    on = unet.apply(
        {"params": params}, x, t, ctx,
        SpatialControl(local, centers, jnp.full((B, 2), 2.5), active),
    )
    # uncond rows identical, cond rows changed
    np.testing.assert_allclose(np.asarray(on[:B]), np.asarray(vanilla[:B]), atol=1e-4)
    assert np.abs(np.asarray(on[B:]) - np.asarray(vanilla[B:])).max() > 1e-4


def test_jit_and_grad_to_coef(unet_and_params):
    unet, params = unet_and_params
    rng = np.random.RandomState(2)
    B = 1
    x = jnp.array(rng.randn(2 * B, 16, 16, 4), jnp.float32)
    t = jnp.array([981] * 2 * B, jnp.int32)
    ctx = jnp.array(rng.randn(2 * B, 7, 16), jnp.float32)
    local = jnp.array(rng.randn(B, 2, 7, 16), jnp.float32)
    centers = jnp.full((B, 2, 2), 0.5, jnp.float32)

    @jax.jit
    def loss(coef):
        ctrl = SpatialControl(local, centers, coef, jnp.ones((B, 2)))
        out = unet.apply({"params": params}, x, t, ctx, ctrl)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(jnp.ones((B, 2)))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)


def test_unconditional_context_free_forward():
    """context=None → the cross-attention slot becomes self-attention
    (reference `attention.py:161` default(context_dim, query_dim)); used by
    unconditional LDMs (`scripts/sample_diffusion.py`)."""
    unet = UNet(TINY, radius=0.2)
    x = jnp.array(np.random.RandomState(0).randn(2, 16, 16, 4), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    params = unet.init(jax.random.PRNGKey(0), x, t, None)["params"]
    params = randomize_params(params, jax.random.PRNGKey(1))
    out = jax.jit(lambda p, x, t: unet.apply({"params": p}, x, t, None))(
        params, x, t)
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))
    # attn2 q/k/v all project from the model dim (self-attention shape)
    a2 = params["down_attn_0"]["block_0"]["attn2"]
    assert a2["to_k"]["kernel"].shape[0] == a2["to_q"]["kernel"].shape[0]


def test_conv_norm_barrier_is_identity():
    """conv_norm_barrier only changes XLA fusion decisions
    (optimization_barrier), never numerics: outputs are bit-exact."""
    import dataclasses
    import numpy as np
    from diffusion_spacetime_attn_tpu.config import UNetConfig
    from diffusion_spacetime_attn_tpu.models.unet import UNet

    cfg = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                     attention_resolutions=(1, 2), num_heads=2, context_dim=16)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 4), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    ctx = jnp.asarray(np.random.RandomState(1).randn(2, 5, 16), jnp.float32)
    base = UNet(cfg, radius=0.2)
    params = base.init(jax.random.PRNGKey(0), x, t, ctx)
    from diffusion_spacetime_attn_tpu.utils.testing import randomize_params
    params = {"params": randomize_params(params["params"], jax.random.PRNGKey(1), scale=0.2)}
    barr = UNet(dataclasses.replace(cfg, conv_norm_barrier=True), radius=0.2)
    a = base.apply(params, x, t, ctx)
    b = barr.apply(params, x, t, ctx)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
