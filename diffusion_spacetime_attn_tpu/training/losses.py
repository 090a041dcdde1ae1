"""Layout-predictor training losses, vectorized to fixed shapes.

Reference:
  * `Customized_Hinge_Loss` (`trainer/loss.py:315-333`): for a relation
    (i, j, rel) the GMM means of the two object tokens must satisfy the
    relation with a 0.2 margin — e.g. "above" ⇒ max(μy_i) − min(μy_j) pushed
    down to −0.2.  (The reference's leading `torch.clamp` calls are no-ops —
    results discarded — and are not reproduced.)
  * `Customized_Gmm_Loss` (`trainer/loss.py:336-452`): −log Σ_k π_k N(gt)
    per absolute-annotated token.
  * Combination `real_loss + 0.1·gmm_loss` (`trainer/Pretrain.py:262-266`).

The reference loops over relations in Python (variable count); here
relations/absolutes are padded to fixed [R]/[O] with validity masks, so the
whole loss is one jittable expression.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..models.layout.gmm_head import gmm_log_likelihood

# relation ids
REL_ABOVE, REL_BELOW, REL_LEFT, REL_RIGHT = 0, 1, 2, 3
REL_NAMES = ("above", "below", "left of", "right of")
REL_TO_ID = {n: i for i, n in enumerate(REL_NAMES)}


class LayoutBatch(NamedTuple):
    """One fixed-shape training batch."""

    tokens: jnp.ndarray      # [B, L] int32
    object_pos: jnp.ndarray  # [B, L] float/bool — object-token indicator
    rel_idx: jnp.ndarray     # [B, R, 2] int32 — token indices of (obj1, obj2)
    rel_type: jnp.ndarray    # [B, R] int32 — REL_* id
    rel_valid: jnp.ndarray   # [B, R] float
    abs_idx: jnp.ndarray     # [B, O] int32 — token index of annotated object
    abs_xy: jnp.ndarray      # [B, O, 2] float — GT (x, y) center
    abs_valid: jnp.ndarray   # [B, O] float


def hinge_relation_loss(
    gmm: jnp.ndarray, batch: LayoutBatch, margin: float = 0.2, k: int = 5
) -> jnp.ndarray:
    """Σ over valid relations of max(diff, −margin) (scalar)."""
    mu_x = gmm[..., k : 2 * k]   # raw slices [5:10]
    mu_y = gmm[..., 2 * k : 3 * k]  # [10:15]

    def gather(mu, which):
        idx = batch.rel_idx[..., which]  # [B, R]
        return jnp.take_along_axis(mu, idx[..., None], axis=1)  # [B, R, K]

    x1, x2 = gather(mu_x, 0), gather(mu_x, 1)
    y1, y2 = gather(mu_y, 0), gather(mu_y, 1)
    diffs = jnp.stack(
        [
            jnp.max(y1, -1) - jnp.min(y2, -1),  # above
            jnp.max(y2, -1) - jnp.min(y1, -1),  # below
            jnp.max(x1, -1) - jnp.min(x2, -1),  # left of
            jnp.max(x2, -1) - jnp.min(x1, -1),  # right of
        ],
        axis=-1,
    )  # [B, R, 4]
    diff = jnp.take_along_axis(diffs, batch.rel_type[..., None], axis=-1)[..., 0]
    loss = jnp.maximum(diff, -margin)
    return jnp.sum(loss * batch.rel_valid)


def gmm_nll_loss(gmm: jnp.ndarray, batch: LayoutBatch, k: int = 5) -> jnp.ndarray:
    """Σ over valid absolute targets of −log p(gt_xy) (scalar)."""
    raw = jnp.take_along_axis(
        gmm, batch.abs_idx[..., None], axis=1
    )  # [B, O, 6K]
    ll = gmm_log_likelihood(raw, batch.abs_xy, k)  # [B, O]
    return -jnp.sum(ll * batch.abs_valid)


def layout_total_loss(
    gmm: jnp.ndarray,
    batch: LayoutBatch,
    gmm_weight: float = 0.1,
    margin: float = 0.2,
    k: int = 5,
):
    rel = hinge_relation_loss(gmm, batch, margin, k)
    nll = gmm_nll_loss(gmm, batch, k)
    return rel + gmm_weight * nll, {"hinge": rel, "gmm_nll": nll}
