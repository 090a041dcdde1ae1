"""Shared per-step rematerialization wrapper for all samplers.

`remat` accepts:
  False          — no checkpointing (short chains / forward-only)
  True           — full per-step remat (`jax.checkpoint`): O(1) live
                   activations per step, backward recomputes each UNet
                   forward — the TPU replacement for the reference's 48 GB
                   + per-block torch checkpointing (`attention.py:266`)
  a policy name  — selective remat: keep the named XLA values from the
    step's forward so the backward skips recomputing them, trading HBM for
    backward FLOPs.  "dots" saves matmul (attention/projection) outputs;
    "dots_nb" saves only matmuls without batch dims (weights-side).
"""
from __future__ import annotations

import jax

_POLICIES = {
    "dots": "dots_saveable",
    "dots_nb": "dots_with_no_batch_dims_saveable",
}


def maybe_remat(eps_fn, remat):
    if not remat:
        return eps_fn
    if remat is True:
        return jax.checkpoint(eps_fn)
    name = _POLICIES.get(remat, remat)
    policy = getattr(jax.checkpoint_policies, name)
    return jax.checkpoint(eps_fn, policy=policy)
