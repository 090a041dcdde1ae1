"""PLMS (pseudo linear multistep) sampler as a differentiable `lax.scan`.

Reference: `ldm/models/diffusion/plms.py:296-358` — Adams-Bashforth orders
1→4 over the eps history, with a Pseudo-Improved-Euler first step (one extra
model call).  The reference keeps `old_eps` as a Python list inside a Python
loop and backprops through the unrolled graph; here the first step is a
two-eval prologue and steps 1..S-1 are a `lax.scan` whose carry holds the
last three eps.  `jax.grad` through the scan gives the same gradients with
O(1) live activations per step when `remat=True` (the TPU replacement for
the reference's 48 GB + per-block torch checkpointing).

The eps function signature is `eps_fn(x, t, i) -> eps` where `i` is the loop
position — this is how per-step control weights (`coef[:, i]`,
`plms.py:243`) reach the model without any module state.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.schedule import DiffusionSchedule

EpsFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _x_prev(x, e, a_t, a_prev, sqrt_one_minus_at):
    """DDIM/PLMS update with sigma=0 (reference `plms.py:321-338`)."""
    pred_x0 = (x - sqrt_one_minus_at * e) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev) * e
    return jnp.sqrt(a_prev) * pred_x0 + dir_xt, pred_x0


def plms_sample(
    eps_fn: EpsFn,
    x_T: jnp.ndarray,
    sched: DiffusionSchedule,
    remat: bool = True,
) -> jnp.ndarray:
    """Run the full PLMS chain; differentiable w.r.t. anything eps_fn closes
    over (e.g. the [N, S] blend-weight matrix)."""
    from .remat import maybe_remat

    eps_fn = maybe_remat(eps_fn, remat)

    S = sched.num_steps
    ts, ts_next = sched.timesteps, sched.timesteps_next
    al, al_prev, s1m = sched.alphas, sched.alphas_prev, sched.sqrt_one_minus_alphas

    # --- step 0: Pseudo Improved Euler (2nd order, one extra eval) ---
    i0 = jnp.int32(0)
    e0 = eps_fn(x_T, ts[0], i0)
    x_mid, _ = _x_prev(x_T, e0, al[0], al_prev[0], s1m[0])
    e0_next = eps_fn(x_mid, ts_next[0], i0)
    x, _ = _x_prev(x_T, (e0 + e0_next) / 2.0, al[0], al_prev[0], s1m[0])

    zeros = jnp.zeros_like(e0)
    carry = (x, e0, zeros, zeros)  # (x, eps_{i-1}, eps_{i-2}, eps_{i-3})

    def body(carry, i):
        x, o1, o2, o3 = carry
        e = eps_fn(x, ts[i], i)
        e2 = (3.0 * e - o1) / 2.0
        e3 = (23.0 * e - 16.0 * o1 + 5.0 * o2) / 12.0
        e4 = (55.0 * e - 59.0 * o1 + 37.0 * o2 - 9.0 * o3) / 24.0
        order = jnp.minimum(i, 3) - 1  # i=1 → 2nd, i=2 → 3rd, i>=3 → 4th
        e_prime = lax.switch(order, [lambda: e2, lambda: e3, lambda: e4])
        x_new, _ = _x_prev(x, e_prime, al[i], al_prev[i], s1m[i])
        return (x_new, e, o1, o2), None

    (x, *_), _ = lax.scan(body, carry, jnp.arange(1, S))
    return x
