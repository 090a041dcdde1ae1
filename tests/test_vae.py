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


def test_vector_quantizer_semantics():
    """Nearest-code assignment, taming legacy loss weighting, straight-
    through gradients (reference `VQModel.quantize`, `autoencoder.py:39-41`)."""
    import jax

    from diffusion_spacetime_attn_tpu.models.vae import VectorQuantizer

    vq = VectorQuantizer(n_embed=6, embed_dim=4, beta=0.25)
    rng = np.random.RandomState(0)
    z = jnp.array(rng.randn(2, 3, 3, 4), jnp.float32)
    params = vq.init(jax.random.PRNGKey(0), z)["params"]
    zq, loss, idx = vq.apply({"params": params}, z)
    # nearest code by L2 (numpy oracle)
    cb = np.asarray(params["embedding"])
    flat = np.asarray(z).reshape(-1, 4)
    d = ((flat[:, None] - cb[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx).ravel(), d.argmin(1))
    zq_raw = cb[d.argmin(1)].reshape(z.shape)
    np.testing.assert_allclose(np.asarray(zq), zq_raw, atol=1e-6)
    expect_loss = 0.25 * ((zq_raw - flat.reshape(z.shape)) ** 2).mean() \
        + ((zq_raw - flat.reshape(z.shape)) ** 2).mean()
    np.testing.assert_allclose(float(loss), expect_loss, rtol=1e-5)
    # straight-through: d(sum(z_q))/dz == 1 everywhere
    g = jax.grad(lambda zz: jnp.sum(vq.apply({"params": params}, zz)[0]))(z)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(np.asarray(g)))


def test_vqmodel_roundtrip_and_interface():
    import jax

    from diffusion_spacetime_attn_tpu.config import VAEConfig
    from diffusion_spacetime_attn_tpu.models.vae import VQModel
    from diffusion_spacetime_attn_tpu.utils import convert

    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=3,
                    embed_dim=3, n_embed=16)
    model = VQModel(cfg)
    x = jnp.array(np.random.RandomState(1).rand(1, 16, 16, 3) * 2 - 1,
                  jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    rec, emb_loss, idx = model.apply({"params": params}, x)
    assert rec.shape == (1, 16, 16, 3)
    assert idx.shape == (1, 8, 8)
    assert float(emb_loss) >= 0

    # decode_code(indices) == decode(quantized latents)
    quant, _, idx2 = model.apply({"params": params}, x, method=VQModel.encode)
    a = model.apply({"params": params}, idx2, method=VQModel.decode_code)
    b = model.apply({"params": params}, quant, method=VQModel.decode)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    # VQModelInterface: encode → PRE-quant h; decode quantizes inside
    h = model.apply({"params": params}, x, method=VQModel.interface_encode)
    out_q = model.apply({"params": params}, h, method=VQModel.interface_decode)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(rec), atol=1e-5)
    out_nq = model.apply({"params": params}, h, False,
                         method=VQModel.interface_decode)
    assert np.isfinite(np.asarray(out_nq)).all()

    # converter: synthesized torch-named state dict → identical structure
    import torch

    flat = {}
    def walk(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, f"{prefix}{k}.")
            else:
                flat[f"{prefix}{k}"] = v
    walk(params, "")
    # minimal fake torch sd via reverse mapping: reuse convert's forward
    # mapping by building torch arrays of the right shapes from a real
    # torch VQ-layout dict is overkill here; instead verify the quantize
    # hookup of convert_sd_vq on top of the tested convert_sd_vae path
    sd = {"first_stage_model.quantize.embedding.weight":
          np.asarray(params["quantize"]["embedding"])}
    try:
        convert.convert_sd_vq(sd, ch_mult=(1, 2), num_res_blocks=1)
        assert False, "should fail without encoder keys"
    except KeyError:
        pass
