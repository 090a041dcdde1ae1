"""Legacy layout-training losses (the `trainer/loss.py:89-716` family).

These drive the legacy trainer family (`trainer/{Trainer,RegTrainer,
Finetune}.py`) for the legacy models in `models/layout/legacy.py`; the LIVE
paper losses (hinge + GMM NLL, `Pretrain.py`) are in `training/losses.py`.

All functions are shape-static and jittable: the reference's boolean
indexing (`gmm[non_ignore_mask]`) becomes masked sums, and its top-k
`scatter_` mask becomes a `lax.top_k` mask — identical sums, no dynamic
shapes.  Each formula cites its reference lines and is replicated *as
executed* there (including quirks like RegLoss's pretrain branch computing
but never using `target_wh`, `loss.py:49-51` — dead statements are not
reproduced).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

GMM_K = 5
IGNORE_XYWH = 2.0  # the [2,2,2,2] "no label" sentinel (`VGDataset.py:84`)


def _gmm_params(gmm: jnp.ndarray):
    """`Log_Pdf.get_gmm_params` (`loss.py:203-216`): split [*, 6K] →
    (softmax π, μx, μy, exp σx, exp σy, tanh ρ)."""
    pi, ux, uy, sx, sy, rho = jnp.split(gmm, 6, axis=-1)
    return (jax.nn.softmax(pi, axis=-1), ux, uy,
            jnp.exp(sx), jnp.exp(sy), jnp.tanh(rho))


def _bivariate_log_pdf(gmm, gt_a, gt_b, topk: int = -1):
    """`Log_Pdf.pdf` (`loss.py:240-268`): log Σ_k π_k N((a,b); …) + 1e-5,
    optionally restricted to the Topk components nearest (gt_a, gt_b)."""
    pi, ux, uy, sx, sy, rho = _gmm_params(gmm)
    a = gt_a[..., None]
    b = gt_b[..., None]
    zx = ((a - ux) / sx) ** 2
    zy = ((b - uy) / sy) ** 2
    zxy = (a - ux) * (b - uy) / (sx * sy)
    z = zx + zy - 2.0 * rho * zxy
    e = jnp.exp(-z / (2.0 * (1.0 - rho ** 2)))
    norm = jnp.clip(2.0 * math.pi * sx * sy * jnp.sqrt(1.0 - rho ** 2),
                    1e-5, None)
    raw = pi * e / norm
    if topk != -1:
        dist = jnp.sqrt((a - ux) ** 2 + (b - uy) ** 2)
        # keep the k NEAREST components (`largest=False`, `loss.py:246-250`)
        _, idx = jax.lax.top_k(-dist, topk)
        mask = jnp.zeros_like(raw).at[
            jnp.arange(raw.shape[0])[:, None], idx].set(1.0)
        raw = raw * mask
    return jnp.log(jnp.sum(raw, axis=-1) + 1e-5)


def _bivar_kl_vs_unit(pi, mu, sigma, mask):
    """`Log_Pdf.batch_Bivar_KLDivLoss` (`loss.py:174-202`): KL of each
    diagonal component N(μ, diag σ) against N(μ, I) (mu2=mu1, sigma2=1), so
      KL = 0.5 (−log σx σy − 2 + σx + σy)
    summed over components and rows (π is unused there too)."""
    sx = sigma[..., 0]
    sy = sigma[..., 1]
    per = 0.5 * (-jnp.log(sx * sy) - 2.0 + sx + sy)
    return jnp.sum(per.sum(-1) * mask)


def log_pdf_loss(
    gmm: jnp.ndarray,          # [T, 12K] — xy gmm ‖ wh gmm (`loss.py:117-118`)
    xywh: jnp.ndarray,         # [T, 4] targets; rows with x==2 ignored
    only_wh: bool = False,
    rel_gt: bool = False,
    topk: int = -1,
    kd: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`Log_Pdf.forward` (`loss.py:107-172`), reduction='sum'.

    Returns (bbox_loss, kl_loss).  With rel_gt=False only odd rows [1::2]
    (the object-token positions of the interleaved legacy layout sequence)
    carry labels.
    """
    if not rel_gt:
        gmm = gmm[1::2]
        xywh = xywh[1::2]
    mask = (xywh[:, 0] != IGNORE_XYWH).astype(gmm.dtype)

    xy_gmm = gmm[:, : GMM_K * 6]
    wh_gmm = gmm[:, GMM_K * 6:]
    if only_wh:
        gt_x, gt_y = xywh[:, 2], xywh[:, 3]
    else:
        gt_x, gt_y = xywh[:, 0], xywh[:, 1]
    gt_w, gt_h = xywh[:, 2], xywh[:, 3]

    xy_pdf = _bivariate_log_pdf(xy_gmm, gt_x, gt_y, topk)
    wh_pdf = _bivariate_log_pdf(wh_gmm, gt_w, gt_h, topk)
    bbox_loss = -jnp.sum(xy_pdf * mask) - jnp.sum(wh_pdf * mask)

    kl_loss = jnp.zeros((), gmm.dtype)
    if kd:
        for g in (xy_gmm, wh_gmm):
            pi, ux, uy, sx, sy, _ = _gmm_params(g)
            mu = jnp.stack([ux, uy], -1)
            sig = jnp.stack([sx, sy], -1)
            kl_loss = kl_loss + _bivar_kl_vs_unit(pi, mu, sig, mask)
    return bbox_loss, kl_loss


def reg_loss(
    pred: jnp.ndarray,          # [T, 4]
    target: jnp.ndarray,        # [T, 4]
    pretrain: bool = False,
    reduction: str = "sum",
) -> jnp.ndarray:
    """`RegLoss.forward` (`loss.py:20-89`): |pred| vs target, MSE on xy +
    MSE on sqrt(wh), ignore-masked.  Non-pretrain masks every row from the
    FIRST row containing the sentinel onward (`loss.py:63-68` uses the
    first flat `.nonzero()` hit's row)."""
    pred = jnp.abs(pred)
    if pretrain:
        pred = pred[1::2]
        target = target[1::2]
        mask = (target[:, 0] != IGNORE_XYWH).astype(pred.dtype)
    else:
        row_has = jnp.any(target == IGNORE_XYWH, axis=1)
        first = jnp.where(jnp.any(row_has), jnp.argmax(row_has),
                          target.shape[0])
        mask = (jnp.arange(target.shape[0]) < first).astype(pred.dtype)
    xy_se = jnp.sum((pred[:, :2] - target[:, :2]) ** 2, axis=1)
    wh_se = jnp.sum(
        (jnp.sqrt(pred[:, 2:4]) - jnp.sqrt(target[:, 2:4])) ** 2, axis=1)
    xy_loss = jnp.sum(xy_se * mask)
    wh_loss = jnp.sum(wh_se * mask)
    total = xy_loss + wh_loss
    if reduction == "mean":
        n = jnp.clip(jnp.sum(mask), 1.0, None)
        return total / n
    return total


def focal_loss(
    inputs: jnp.ndarray,        # [N, C] scores
    targets: jnp.ndarray,       # [N] class ids
    gamma: float = 2.0,
    alpha: Optional[float] = None,
    ignore_index: Optional[int] = None,
    reduction: str = "sum",
) -> jnp.ndarray:
    """`FocalLoss.forward` (`loss.py:607-650`) as executed: elementwise
    focal weight `where(onehot, 1-x, x)**γ` (on RAW scores — the reference
    quirk), times the SCALAR mean binary cross-entropy of softmax(inputs)
    vs one-hot, summed/meaned.  Ignored rows excluded from both factors."""
    C = inputs.shape[-1]
    onehot = jax.nn.one_hot(targets, C, dtype=inputs.dtype)
    if ignore_index is not None:
        row = (targets != ignore_index).astype(inputs.dtype)[:, None]
    else:
        row = jnp.ones((inputs.shape[0], 1), inputs.dtype)
    fw = jnp.where(onehot == 1.0, 1.0 - inputs, inputs)
    if alpha is not None:
        af = jnp.where(onehot == 1.0, alpha, 1.0 - alpha)
        fw = af * fw ** gamma
    else:
        fw = fw ** gamma
    p = jax.nn.softmax(inputs, axis=-1)
    p = jnp.clip(p, 1e-12, 1.0 - 1e-12)
    bce_elem = -(onehot * jnp.log(p) + (1.0 - onehot) * jnp.log(1.0 - p))
    n_kept = jnp.clip(jnp.sum(row), 1.0, None)
    bce = jnp.sum(bce_elem * row) / (n_kept * C)   # scalar mean, kept rows
    cls = fw * bce * row
    if reduction == "mean":
        return jnp.sum(cls) / (n_kept * C)
    return jnp.sum(cls)


def xent_loss(
    log_probs: jnp.ndarray,     # [N, V] log-probabilities
    targets: jnp.ndarray,       # [N]
    pad_index: int,
    smoothing: float = 0.1,
) -> jnp.ndarray:
    """`XentLoss` (`loss.py:653-716`), reduction='sum'.  smoothing>0:
    KL(smooth_target ‖ exp(log_probs)) with the uniform mass spread over
    V−2 non-target slots, pad column zeroed, pad rows zeroed."""
    N, V = log_probs.shape
    keep = (targets != pad_index).astype(log_probs.dtype)
    if smoothing <= 0.0:
        nll = -jnp.take_along_axis(log_probs, targets[:, None], axis=1)[:, 0]
        return jnp.sum(nll * keep)
    smooth = jnp.full((N, V), smoothing / (V - 2), log_probs.dtype)
    smooth = jnp.where(
        jax.nn.one_hot(targets, V, dtype=bool), 1.0 - smoothing, smooth)
    smooth = smooth.at[:, pad_index].set(0.0)
    smooth = smooth * keep[:, None]
    # torch KLDivLoss(sum): Σ t·(log t − log p), with t·log t := 0 at t=0
    tlogt = jnp.where(smooth > 0, smooth * jnp.log(smooth), 0.0)
    return jnp.sum(tlogt - smooth * log_probs)


def nll_loss(log_probs: jnp.ndarray, targets: jnp.ndarray,
             ignore_index: int = 0) -> jnp.ndarray:
    """torch `nn.NLLLoss(ignore_index, reduction='sum')` — the criterion of
    `Trainer.py:32` / `RegTrainer.py` / `Finetune.py:33`."""
    keep = (targets != ignore_index).astype(log_probs.dtype)
    nll = -jnp.take_along_axis(log_probs, targets[:, None], axis=1)[:, 0]
    return jnp.sum(nll * keep)
