"""GMM bbox head: per-token 5-component bivariate Gaussian mixture over
(x, y) centers.

Reference: `layout_predictor/LayoutTransformer/model/bbox_head.py` —
`PDFDecoder.forward` is, in the paper config (GLOBAL_FEATURE=True), just
`output_Layer(encoder_output)` (a 768→768 linear) feeding `GMM_head`
(`xy_bivariate`: 768→5·6) (`bbox_head.py:227-266,46-86`); the constructed
transformer decoder and refine encoder are never invoked on the forward
path, so they are consciously not reproduced (dead code).

Param layout of the raw 30-vector: [π(5) | μx(5) | μy(5) | log σx(5) |
log σy(5) | arctanh ρ(5)] (`bbox_head.py:114-135`).  ρ is tanh-ed and
clamped to ±0.95 for sampling but *not* clamped inside the training NLL
(`loss.py:336-452`) — both behaviors kept.
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import LayoutConfig


class GMMParams(NamedTuple):
    pi: jnp.ndarray       # [..., K] mixture weights (softmaxed)
    mu_x: jnp.ndarray     # [..., K]
    mu_y: jnp.ndarray
    sigma_x: jnp.ndarray  # [..., K] (exp'd)
    sigma_y: jnp.ndarray
    rho: jnp.ndarray      # [..., K] (tanh'd, NOT clamped)


def split_gmm(raw: jnp.ndarray, k: int = 5) -> GMMParams:
    """raw [..., 6K] → GMMParams (reference get_gmm_params semantics)."""
    pi, ux, uy, sx, sy, rho = jnp.split(raw, 6, axis=-1)
    return GMMParams(
        pi=jax.nn.softmax(pi, axis=-1),
        mu_x=ux,
        mu_y=uy,
        sigma_x=jnp.exp(sx),
        sigma_y=jnp.exp(sy),
        rho=jnp.tanh(rho),
    )


def gmm_log_likelihood(raw: jnp.ndarray, xy: jnp.ndarray, k: int = 5) -> jnp.ndarray:
    """log Σ_k π_k N(xy; μ, σ, ρ) + 1e-5  per token (reference
    `loss.py:357-381` pdf; the training NLL is the negative sum)."""
    p = split_gmm(raw, k)
    x = xy[..., 0:1]
    y = xy[..., 1:2]
    zx = ((x - p.mu_x) / p.sigma_x) ** 2
    zy = ((y - p.mu_y) / p.sigma_y) ** 2
    zxy = (x - p.mu_x) * (y - p.mu_y) / (p.sigma_x * p.sigma_y)
    z = zx + zy - 2.0 * p.rho * zxy
    a = -z / (2.0 * (1.0 - p.rho ** 2))
    norm = jnp.clip(
        2.0 * jnp.pi * p.sigma_x * p.sigma_y * jnp.sqrt(1.0 - p.rho ** 2), 1e-5, None
    )
    raw_pdf = jnp.sum(p.pi * jnp.exp(a) / norm, axis=-1)
    return jnp.log(raw_pdf + 1e-5)


def sample_xy(
    raw: jnp.ndarray,
    rng: jax.Array = None,
    greedy_component: bool = False,
    clamp_rho: float = 0.95,
    k: int = 5,
):
    """Sample (x, y): pick a component (categorical, or argmax if
    greedy_component) and return its mean — the reference's greedy mode
    (`bbox_head.py:138-180`, GREEDY=True in the paper config)."""
    p = split_gmm(raw, k)
    if greedy_component or rng is None:
        idx = jnp.argmax(p.pi, axis=-1)
    else:
        idx = jax.random.categorical(rng, jnp.log(jnp.clip(p.pi, 1e-12, None)), axis=-1)
    ux = jnp.take_along_axis(p.mu_x, idx[..., None], axis=-1)[..., 0]
    uy = jnp.take_along_axis(p.mu_y, idx[..., None], axis=-1)[..., 0]
    return jnp.stack([ux, uy], axis=-1)


class GMMHead(nn.Module):
    """Linear(hidden→hidden) → Linear(hidden→6K)."""

    cfg: LayoutConfig

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        dtype = jnp.dtype(self.cfg.dtype)
        h = nn.Dense(self.cfg.hidden, dtype=dtype, name="output_layer")(features)
        raw = nn.Dense(
            self.cfg.gmm_components * 6, dtype=dtype, name="xy_bivariate"
        )(h)
        return raw.astype(jnp.float32)
