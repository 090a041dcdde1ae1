"""Perceptual (LPIPS) and adversarial (PatchGAN) modules for first-stage
autoencoder training.

Reference: `ldm/modules/losses/contperceptual.py` pulls `LPIPS`,
`NLayerDiscriminator`, `hinge_d_loss`, `vanilla_d_loss`, `adopt_weight`
and `weights_init` from the external taming-transformers package
(`taming/modules/losses/{lpips,discriminator}.py`) — re-implemented here
natively:

  * LPIPS: VGG16 feature stack (relu1_2 / relu2_2 / relu3_3 / relu4_3 /
    relu5_3), per-layer unit-normalization, learned 1×1 linear heads,
    input scaling layer with the fixed ImageNet shift/scale constants.
    Weights load from a torch LPIPS checkpoint via `utils.convert`; random
    weights give a valid (if meaningless) perceptual metric for smoke runs
    — LPIPS(x, x) == 0 by construction either way.
  * NLayerDiscriminator: 64-ch PatchGAN, stride-2 convs, LeakyReLU(0.2),
    BatchNorm (flax `batch_stats` collection carried in the train state).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# taming lpips.py ScalingLayer constants
# numpy on purpose — module-level jnp.array would initialize the backend
# at import time (see models/clip.py note)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv plan: (out_channels, pool_before) per conv; taps after the
# last ReLU of each block (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)
_VGG_PLAN = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]
_TAPS = (1, 3, 6, 9, 12)  # conv indices whose activations feed LPIPS


class VGG16Features(nn.Module):
    """VGG16 up to relu5_3, returning the five LPIPS tap activations."""

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        taps = []
        for i, (ch, pool) in enumerate(_VGG_PLAN):
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(ch, (3, 3), padding=1, name=f"conv_{i}")(x)
            x = nn.relu(x)
            if i in _TAPS:
                taps.append(x)
        return taps


def _unit_normalize(x, eps=1e-10):
    return x / (jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True)) + eps)


class LPIPS(nn.Module):
    """Learned perceptual distance (taming `lpips.py`).  Inputs in [-1, 1],
    NHWC.  Returns per-sample distance [B, 1, 1, 1] (reference keeps the
    spatial singleton dims so it broadcasts against |x−x̂|)."""

    @nn.compact
    def __call__(self, x, y):
        net = VGG16Features(name="vgg")

        def feats(im):
            scaled = (im - _SHIFT) / _SCALE
            return net(scaled)

        fx, fy = feats(x), feats(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, name=f"lin_{i}")
            total = total + jnp.mean(lin(d), axis=(1, 2), keepdims=True)
        return total


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (taming `discriminator.py`): Conv(4,4,s2) →
    LeakyReLU, then n_layers of Conv-BN-LeakyReLU with doubling channels,
    then a stride-1 stage and a 1-channel logit conv."""

    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = True):
        lrelu = lambda h: nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1, name="conv0")(x)
        h = lrelu(h)
        mult = 1
        for n in range(1, self.n_layers + 1):
            mult = min(2 ** n, 8)
            stride = 2 if n < self.n_layers else 1
            h = nn.Conv(self.ndf * mult, (4, 4), strides=(stride, stride),
                        padding=1, use_bias=False, name=f"conv{n}")(h)
            h = nn.BatchNorm(use_running_average=not train,
                             name=f"bn{n}")(h)
            h = lrelu(h)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=1, name="logits")(h)


def hinge_d_loss(logits_real, logits_fake):
    """taming `vqperceptual.hinge_d_loss`."""
    return 0.5 * (jnp.mean(nn.relu(1.0 - logits_real))
                  + jnp.mean(nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    """taming `vqperceptual.vanilla_d_loss`."""
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def adopt_weight(weight: float, global_step, threshold: int = 0,
                 value: float = 0.0):
    """taming `vqperceptual.adopt_weight`: zero before `threshold` steps."""
    return jnp.where(global_step < threshold, value, weight)
