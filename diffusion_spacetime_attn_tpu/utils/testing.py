"""Test/bench helpers."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def randomize_params(params, rng: jax.Array, scale: float = 0.02):
    """Replace every parameter with N(0, scale²) noise (same shapes/dtypes).

    SD-style models zero-initialize their output convs, so a freshly
    initialized network is degenerate (identically-zero output); tests and
    throughput benches need non-degenerate weights without real checkpoints.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rngs = jax.random.split(rng, len(leaves))
    new = [
        jax.random.normal(r, leaf.shape, leaf.dtype) * jnp.asarray(scale, leaf.dtype)
        for r, leaf in zip(rngs, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new)
