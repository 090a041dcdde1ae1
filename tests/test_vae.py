import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_spacetime_attn_tpu.config import VAEConfig
from diffusion_spacetime_attn_tpu.models.vae import AutoencoderKL

# ch must be ≥32 (GroupNorm(32) everywhere, as in the reference)
TINY = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4, embed_dim=4)


@pytest.fixture(scope="module")
def vae_and_params():
    vae = AutoencoderKL(TINY)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    return vae, params


def test_roundtrip_shapes(vae_and_params):
    vae, params = vae_and_params
    x = jnp.array(np.random.RandomState(0).randn(2, 16, 16, 3), jnp.float32)
    mean, logvar = vae.apply(
        {"params": params}, x, method=AutoencoderKL.encode_moments
    )
    # one downsample level (ch_mult has 2 entries) → /2
    assert mean.shape == (2, 8, 8, 4)
    assert logvar.shape == (2, 8, 8, 4)
    z = vae.apply({"params": params}, x, method=AutoencoderKL.encode)
    out = vae.apply({"params": params}, z, method=AutoencoderKL.decode)
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_decode_differentiable(vae_and_params):
    vae, params = vae_and_params

    def loss(z):
        img = vae.apply({"params": params}, z, method=AutoencoderKL.decode)
        return jnp.sum(img ** 2)

    z = jnp.array(np.random.RandomState(1).randn(1, 8, 8, 4), jnp.float32)
    g = jax.grad(loss)(z)
    assert np.all(np.isfinite(np.asarray(g)))
