"""First-stage (AutoencoderKL) training: LPIPS + KL + PatchGAN adversarial.

Reference: `ldm/models/autoencoder.py:285-430` (AutoencoderKL training_step
with two optimizers) driving `ldm/modules/losses/contperceptual.py`
`LPIPSWithDiscriminator`:

  rec   = |x − x̂| + perceptual_weight · LPIPS(x, x̂)
  nll   = rec / exp(logvar) + logvar            (learned scalar logvar)
  kl    = KL(q(z|x) ‖ N(0,1))                   (sum over latent dims / B)
  g     = −E[D(x̂)]
  d_w   = ‖∇_last nll‖ / (‖∇_last g‖ + 1e-4)    (adaptive, `contperceptual.py:32-43`)
  L_ae  = nll + kl_weight·kl + d_w·disc_factor·g
  L_d   = disc_factor · hinge(D(x), D(x̂.detach))

with disc_factor gated on `global_step ≥ disc_start` (adopt_weight).
Lightning's two-optimizer alternation becomes ONE jitted step that updates
the autoencoder (discriminator frozen) and then the discriminator
(autoencoder frozen) — the same per-batch schedule, one XLA program.  The
adaptive weight's last-layer gradients (`decoder/conv_out/kernel`) are two
extra decoder-only VJPs inside the same program.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.vae import AutoencoderKL
from .perceptual import (
    LPIPS,
    NLayerDiscriminator,
    adopt_weight,
    hinge_d_loss,
    vanilla_d_loss,
)


@dataclasses.dataclass(frozen=True)
class VAETrainConfig:
    """`configs/autoencoder/autoencoder_kl_*.yaml` + LPIPSWithDiscriminator
    defaults (kl f8: base_lr 4.5e-6, kl_weight 1e-6, disc_weight 0.5,
    disc_start 50001)."""

    base_lr: float = 4.5e-6
    kl_weight: float = 1e-6
    pixel_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_start: int = 50001
    disc_factor: float = 1.0
    disc_weight: float = 0.5
    disc_loss: str = "hinge"        # "hinge" | "vanilla"
    disc_ndf: int = 64
    disc_layers: int = 3
    logvar_init: float = 0.0


class VAETrainState(NamedTuple):
    ae_params: Any
    logvar: jnp.ndarray             # learned scalar
    disc_params: Any
    disc_stats: Any                 # BatchNorm running stats
    lpips_params: Any               # frozen
    opt_ae: Any
    opt_disc: Any
    step: jnp.ndarray


def kl_divergence(mean, logvar):
    """DiagonalGaussianDistribution.kl() vs N(0,1), summed over latent dims
    (`ldm/modules/distributions/distributions.py:47-56`)."""
    return 0.5 * jnp.sum(mean ** 2 + jnp.exp(logvar) - 1.0 - logvar,
                         axis=(1, 2, 3))


class VAETrainer:
    """Functional core + convenience wrapper (jit, init, checkpoint-free).

    With `mesh` (a `Mesh(('data', ...))`), the image batch shards over the
    data axis and the state replicates — the gradient all-reduce is a GSPMD
    psum over ICI, same shape as the LDM trainer.
    """

    def __init__(self, vae: AutoencoderKL, cfg: VAETrainConfig, mesh=None,
                 fsdp: bool = False):
        self.vae = vae
        self.cfg = cfg
        self.mesh = mesh
        self.fsdp = fsdp and mesh is not None
        self.disc = NLayerDiscriminator(ndf=cfg.disc_ndf, n_layers=cfg.disc_layers)
        self.lpips = LPIPS()
        self._opt_ae = optax.adam(cfg.base_lr, b1=0.5, b2=0.9)
        self._opt_disc = optax.adam(cfg.base_lr, b1=0.5, b2=0.9)
        if self.fsdp:
            self._step = None  # built in init() from the state's structure
        elif mesh is not None:
            from ..parallel.mesh import data_sharding, replicated

            rep = replicated(mesh)
            self._step = jax.jit(
                self._make_step(),
                in_shardings=(rep, data_sharding(mesh, 4), rep),
                out_shardings=(rep, rep),
            )
        else:
            self._step = jax.jit(self._make_step())

    def init(self, rng: jax.Array, image_hw: int = 64,
             lpips_params: Any = None) -> VAETrainState:
        def build(rng, lpips_params):
            r1, r2, r3 = jax.random.split(rng, 3)
            x = jnp.zeros((1, image_hw, image_hw, 3))
            ae_params = self.vae.init(r1, x)["params"]
            dvars = self.disc.init(r2, x, train=True)
            if lpips_params is None:
                lpips_params = self.lpips.init(r3, x, x)["params"]
            logvar = jnp.asarray(self.cfg.logvar_init, jnp.float32)
            return VAETrainState(
                ae_params=ae_params,
                logvar=logvar,
                disc_params=dvars["params"],
                disc_stats=dvars.get("batch_stats", {}),
                lpips_params=lpips_params,
                opt_ae=self._opt_ae.init((ae_params, logvar)),
                opt_disc=self._opt_disc.init(dvars["params"]),
                step=jnp.zeros((), jnp.int32),
            )

        if not self.fsdp:
            return build(rng, lpips_params)
        # ZeRO-style: shardings from shapes, state born sharded (same
        # scheme as LDMTrainer.init — see training/ldm_trainer.py)
        from ..parallel.mesh import data_sharding, replicated
        from ..parallel.sharding import fsdp_sharding

        state_shape = jax.eval_shape(build, rng, lpips_params)
        shardings = fsdp_sharding(self.mesh, state_shape)
        self._step = jax.jit(
            self._make_step(),
            in_shardings=(shardings, data_sharding(self.mesh, 4),
                          replicated(self.mesh)),
            out_shardings=(shardings, replicated(self.mesh)),
        )
        return jax.jit(build, out_shardings=shardings)(rng, lpips_params)

    def train_step(self, state: VAETrainState, images: jnp.ndarray,
                   rng: jax.Array) -> Tuple[VAETrainState, dict]:
        """images [B,H,W,3] in [-1,1]."""
        return self._step(state, images, rng)

    def make_step(self):
        """The raw (un-jitted) step fn — for callers that fold many steps
        into one program (e.g. lax.scan chunks amortizing per-dispatch
        tunnel latency; scripts/train_testbed.py)."""
        return self._make_step()

    # ---- internals ----
    def _reconstruct(self, ae_params, images, rng):
        z = self.vae.apply({"params": ae_params}, images, rng,
                           method=AutoencoderKL.encode)
        recon = self.vae.apply({"params": ae_params}, z,
                               method=AutoencoderKL.decode)
        mean, logvar = self.vae.apply({"params": ae_params}, images,
                                      method=AutoencoderKL.encode_moments)
        return recon, mean, logvar

    def _make_step(self):
        cfg = self.cfg
        d_loss_fn = hinge_d_loss if cfg.disc_loss == "hinge" else vanilla_d_loss

        def nll_of(recon, images, lpips_params, logvar):
            rec = cfg.pixel_weight * jnp.abs(images - recon)
            if cfg.perceptual_weight > 0:
                p = self.lpips.apply({"params": lpips_params}, images, recon)
                rec = rec + cfg.perceptual_weight * p
            nll = rec / jnp.exp(logvar) + logvar
            B = images.shape[0]
            return jnp.sum(nll) / B, jnp.sum(rec) / B

        def step(state: VAETrainState, images, rng):
            disc_factor = adopt_weight(cfg.disc_factor, state.step,
                                       cfg.disc_start)

            def disc_logits(x, params, stats):
                return self.disc.apply(
                    {"params": params, "batch_stats": stats}, x, train=False)

            # ---- adaptive weight: ∇ wrt the decoder's last conv kernel ----
            # Differentiate w.r.t. the last-layer kernel ONLY (matching the
            # reference's `last_layer`-restricted autograd.grad,
            # `contperceptual.py:32-43`): closing over the rest of ae_params
            # keeps each VJP a single-tensor backward instead of a full
            # all-params backward whose cotangents XLA may not fully DCE.
            def with_last(kernel):
                p = dict(state.ae_params)
                dec = dict(p["decoder"])
                co = dict(dec["conv_out"])
                co["kernel"] = kernel
                dec["conv_out"] = co
                p["decoder"] = dec
                return p

            def nll_scalar(kernel):
                recon, _, _ = self._reconstruct(with_last(kernel), images, rng)
                return nll_of(recon, images, state.lpips_params, state.logvar)[0]

            def g_scalar(kernel):
                recon, _, _ = self._reconstruct(with_last(kernel), images, rng)
                return -jnp.mean(disc_logits(recon, state.disc_params,
                                             state.disc_stats))

            kernel0 = state.ae_params["decoder"]["conv_out"]["kernel"]
            g_nll = jax.grad(nll_scalar)(kernel0)
            g_g = jax.grad(g_scalar)(kernel0)
            d_weight = jnp.linalg.norm(g_nll) / (jnp.linalg.norm(g_g) + 1e-4)
            d_weight = jax.lax.stop_gradient(
                jnp.clip(d_weight, 0.0, 1e4)) * cfg.disc_weight

            # ---- generator (autoencoder) update ----
            def ae_loss_fn(trainable):
                ae_params, logvar = trainable
                recon, mean, lv = self._reconstruct(ae_params, images, rng)
                nll, rec = nll_of(recon, images, state.lpips_params, logvar)
                kl = jnp.sum(kl_divergence(mean, lv)) / images.shape[0]
                g = -jnp.mean(disc_logits(recon, state.disc_params,
                                          state.disc_stats))
                loss = nll + cfg.kl_weight * kl + d_weight * disc_factor * g
                return loss, dict(nll_loss=nll, rec_loss=rec, kl_loss=kl,
                                  g_loss=g, d_weight=d_weight,
                                  total_loss=loss)

            trainable = (state.ae_params, state.logvar)
            (_, metrics), grads = jax.value_and_grad(
                ae_loss_fn, has_aux=True)(trainable)
            updates, opt_ae = self._opt_ae.update(grads, state.opt_ae, trainable)
            ae_params, logvar = optax.apply_updates(trainable, updates)

            # ---- discriminator update (autoencoder frozen) ----
            recon, _, _ = self._reconstruct(state.ae_params, images, rng)
            recon = jax.lax.stop_gradient(recon)

            def d_loss_wrap(disc_params):
                lr_, stats1 = self.disc.apply(
                    {"params": disc_params, "batch_stats": state.disc_stats},
                    images, train=True, mutable=["batch_stats"])
                lf_, stats2 = self.disc.apply(
                    {"params": disc_params, "batch_stats": stats1["batch_stats"]},
                    recon, train=True, mutable=["batch_stats"])
                return disc_factor * d_loss_fn(lr_, lf_), stats2["batch_stats"]

            (d_loss, disc_stats), d_grads = jax.value_and_grad(
                d_loss_wrap, has_aux=True)(state.disc_params)
            d_updates, opt_disc = self._opt_disc.update(
                d_grads, state.opt_disc, state.disc_params)
            disc_params = optax.apply_updates(state.disc_params, d_updates)
            metrics["disc_loss"] = d_loss

            return VAETrainState(
                ae_params=ae_params, logvar=logvar,
                disc_params=disc_params, disc_stats=disc_stats,
                lpips_params=state.lpips_params,
                opt_ae=opt_ae, opt_disc=opt_disc,
                step=state.step + 1,
            ), metrics

        return step
