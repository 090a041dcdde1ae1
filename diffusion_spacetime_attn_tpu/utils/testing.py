"""Test/bench helpers."""
from __future__ import annotations

import hashlib

import jax
import numpy as np


def randomize_params(params, rng: jax.Array, scale: float = 0.02):
    """Replace every parameter with N(0, scale²) noise (same shapes/dtypes).

    SD-style models zero-initialize their output convs, so a freshly
    initialized network is degenerate (identically-zero output); tests and
    throughput benches need non-degenerate weights without real checkpoints.

    Noise is generated host-side with numpy (seeded from the key) — one
    device_put per leaf instead of thousands of tiny device computations,
    which matters on a tunneled TPU.
    """
    seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1]) & 0x7FFFFFFF

    def leaf(path, x):
        name = "/".join(str(p) for p in path).encode()
        h = int.from_bytes(hashlib.sha1(name).digest()[:4], "little")
        r = np.random.RandomState((seed ^ h) & 0x7FFFFFFF)
        return (r.standard_normal(x.shape) * scale).astype(x.dtype)

    return jax.tree_util.tree_map_with_path(leaf, params)


def randomize_params_on_device(shapes, rng: jax.Array, scale: float = 0.02):
    """Like randomize_params but generated ON device in one jitted
    executable — no multi-GB host→device transfer (the tunnel makes
    device_put of full-size params take minutes)."""
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def gen(key):
        keys = jax.random.split(key, len(leaves))
        return [
            (jax.random.normal(k, l.shape, jnp_float(l.dtype)) * scale).astype(l.dtype)
            for k, l in zip(keys, leaves)
        ]

    return jax.tree_util.tree_unflatten(treedef, gen(rng))


def jnp_float(dtype):
    import jax.numpy as jnp

    d = jnp.dtype(dtype)
    return d if d.kind == "f" else jnp.float32
