"""Autoencoder training: LPIPS, PatchGAN discriminator, the
LPIPSWithDiscriminator loss schedule, and the two-optimizer train step.

Reference: `ldm/modules/losses/contperceptual.py` + taming
`vqperceptual/lpips/discriminator` (external in the reference);
`ldm/models/autoencoder.py` training_step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_spacetime_attn_tpu.config import VAEConfig
from diffusion_spacetime_attn_tpu.models.vae import AutoencoderKL
from diffusion_spacetime_attn_tpu.training.perceptual import (
    LPIPS,
    NLayerDiscriminator,
    adopt_weight,
    hinge_d_loss,
    vanilla_d_loss,
)
from diffusion_spacetime_attn_tpu.training.vae_trainer import (
    VAETrainConfig,
    VAETrainer,
    kl_divergence,
)


def test_lpips_zero_for_identical_and_positive_otherwise():
    lp = LPIPS()
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3) * 2 - 1,
                    jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3) * 2 - 1,
                    jnp.float32)
    params = lp.init(jax.random.PRNGKey(0), x, x)["params"]
    # random linear heads can have any sign — use |lin| weights to check
    # positivity of the distance form
    params = jax.tree_util.tree_map(jnp.abs, params)
    d_same = lp.apply({"params": params}, x, x)
    d_diff = lp.apply({"params": params}, x, y)
    assert d_same.shape == (2, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    assert float(jnp.min(d_diff)) > 0.0


def test_discriminator_patch_logits_shape():
    d = NLayerDiscriminator(ndf=16, n_layers=3)
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = d.init(jax.random.PRNGKey(0), x, train=True)
    out = d.apply(vars_, x, train=False)
    # 64 → 32 → 16 → 8 (stride-1 stage + logit conv keep 8 modulo padding)
    assert out.shape[0] == 2 and out.shape[-1] == 1
    assert out.shape[1] <= 8 and out.shape[1] >= 6  # patch map, not scalar


def test_gan_loss_formulas_match_reference():
    """hinge/vanilla d-losses vs direct numpy replication of taming
    `vqperceptual.py` (the exact functions the reference imports)."""
    r = np.random.RandomState(0)
    lr_, lf_ = r.randn(4, 5, 5, 1).astype(np.float32), r.randn(4, 5, 5, 1).astype(np.float32)
    want_h = 0.5 * (np.mean(np.maximum(1 - lr_, 0)) + np.mean(np.maximum(1 + lf_, 0)))
    np.testing.assert_allclose(float(hinge_d_loss(jnp.asarray(lr_), jnp.asarray(lf_))),
                               want_h, rtol=1e-6)
    sp = lambda v: np.log1p(np.exp(-np.abs(v))) + np.maximum(v, 0)  # stable softplus
    want_v = 0.5 * (np.mean(sp(-lr_)) + np.mean(sp(lf_)))
    np.testing.assert_allclose(float(vanilla_d_loss(jnp.asarray(lr_), jnp.asarray(lf_))),
                               want_v, rtol=1e-5)
    assert float(adopt_weight(1.0, jnp.asarray(10), threshold=50)) == 0.0
    assert float(adopt_weight(1.0, jnp.asarray(50), threshold=50)) == 1.0


def test_kl_divergence_formula():
    r = np.random.RandomState(0)
    mean = r.randn(2, 4, 4, 3).astype(np.float32)
    logvar = r.randn(2, 4, 4, 3).astype(np.float32)
    want = 0.5 * np.sum(mean ** 2 + np.exp(logvar) - 1.0 - logvar, axis=(1, 2, 3))
    np.testing.assert_allclose(
        np.asarray(kl_divergence(jnp.asarray(mean), jnp.asarray(logvar))),
        want, rtol=1e-5)


@pytest.mark.parametrize("disc_on", [False, True])
def test_vae_train_step_runs_and_reduces_rec(disc_on):
    """A few steps on one repeated image: reconstruction improves; with the
    discriminator gate open, adversarial terms are finite and the adaptive
    weight is produced."""
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                                  z_channels=2, embed_dim=2))
    cfg = VAETrainConfig(base_lr=2e-3, disc_start=0 if disc_on else 10_000,
                         disc_ndf=8, disc_layers=2, perceptual_weight=0.0)
    tr = VAETrainer(vae, cfg)
    state = tr.init(jax.random.PRNGKey(0), image_hw=16)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3) * 2 - 1,
                    jnp.float32)
    recs = []
    for i in range(8):
        state, m = tr.train_step(state, x, jax.random.PRNGKey(i))
        recs.append(float(m["rec_loss"]))
        assert np.isfinite(recs[-1]) and np.isfinite(float(m["disc_loss"]))
    assert recs[-1] < recs[0]
    if disc_on:
        assert float(m["d_weight"]) >= 0.0 and np.isfinite(float(m["g_loss"]))
    else:
        # gate closed: disc_factor 0 ⇒ no adversarial pressure on the AE
        assert float(m["disc_loss"]) == 0.0


def test_lpips_converter_structure_and_apply():
    """convert_lpips maps a taming-layout state_dict (torchvision VGG16
    feature indices preserved inside slices, lin{j}.model.1 1x1 heads) onto
    the flax LPIPS; the converted tree applies cleanly."""
    from diffusion_spacetime_attn_tpu.utils.convert import (
        _VGG16_CONV_IDX, _VGG16_SLICE_OF, convert_lpips,
    )

    r = np.random.RandomState(0)
    plan = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    sd = {}
    cin = 3
    for j, i in enumerate(_VGG16_CONV_IDX):
        k = f"net.slice{_VGG16_SLICE_OF[i]}.{i}"
        sd[f"{k}.weight"] = r.randn(plan[j], cin, 3, 3).astype(np.float32)
        sd[f"{k}.bias"] = r.randn(plan[j]).astype(np.float32)
        cin = plan[j]
    for j, c in enumerate([64, 128, 256, 512, 512]):
        sd[f"lin{j}.model.1.weight"] = np.abs(
            r.randn(1, c, 1, 1)).astype(np.float32)

    params = convert_lpips(sd)
    lp = LPIPS()
    x = jnp.asarray(r.rand(1, 32, 32, 3) * 2 - 1, jnp.float32)
    y = jnp.asarray(r.rand(1, 32, 32, 3) * 2 - 1, jnp.float32)
    d = lp.apply({"params": params}, x, y)
    assert d.shape == (1, 1, 1, 1) and np.isfinite(float(d[0, 0, 0, 0]))
    np.testing.assert_allclose(
        float(lp.apply({"params": params}, x, x)[0, 0, 0, 0]), 0.0, atol=1e-6)


def test_vae_trainer_data_parallel_mesh():
    """The autoencoder train step under a Mesh(('data',)): batch sharded,
    state replicated, finite losses (GSPMD inserts the grad all-reduce)."""
    from diffusion_spacetime_attn_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=8)
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                                  z_channels=2, embed_dim=2))
    cfg = VAETrainConfig(base_lr=1e-3, disc_start=0, disc_ndf=8,
                         disc_layers=2, perceptual_weight=0.0)
    tr = VAETrainer(vae, cfg, mesh=mesh)
    state = tr.init(jax.random.PRNGKey(0), image_hw=16)
    x = jnp.asarray(np.random.RandomState(0).rand(8, 16, 16, 3) * 2 - 1,
                    jnp.float32)
    state, m = tr.train_step(state, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["total_loss"]))
    assert np.isfinite(float(m["disc_loss"]))


def test_vae_trainer_fsdp_matches_replicated():
    """fsdp=True: autoencoder + discriminator weights and both Adam states
    sharded over the data axis, numerics identical to the replicated step."""
    from diffusion_spacetime_attn_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=8)
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                                  z_channels=2, embed_dim=2))
    cfg = VAETrainConfig(base_lr=1e-3, disc_start=0, disc_ndf=8,
                         disc_layers=2, perceptual_weight=0.0)
    x = jnp.asarray(np.random.RandomState(3).rand(8, 16, 16, 3) * 2 - 1,
                    jnp.float32)
    key = jax.random.PRNGKey(4)

    tr_f = VAETrainer(vae, cfg, mesh=mesh, fsdp=True)
    st_f = tr_f.init(jax.random.PRNGKey(0), image_hw=16)
    sharded = [l for l in jax.tree_util.tree_leaves(st_f.ae_params)
               if hasattr(l, "sharding") and "data" in str(l.sharding.spec)]
    assert sharded, "no ae leaf got FSDP-sharded"
    st_f, m_f = tr_f.train_step(st_f, x, key)

    tr_r = VAETrainer(vae, cfg, mesh=mesh)
    st_r = tr_r.init(jax.random.PRNGKey(0), image_hw=16)
    st_r, m_r = tr_r.train_step(st_r, x, key)

    np.testing.assert_allclose(float(m_f["total_loss"]),
                               float(m_r["total_loss"]), rtol=2e-5)
    a = jax.tree_util.tree_leaves(st_f.ae_params)[0]
    b = jax.tree_util.tree_leaves(st_r.ae_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
