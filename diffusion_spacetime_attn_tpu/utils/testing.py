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
    import numpy as _np

    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    sizes = [int(_np.prod(l.shape)) for l in leaves]
    total = int(sum(sizes))
    offsets = _np.cumsum([0] + sizes[:-1]).tolist()

    @jax.jit
    def gen(key):
        # ONE random op + cheap slices — compiles in seconds even for
        # thousand-leaf trees (per-leaf random ops took minutes)
        flat = jax.random.normal(key, (total,), jnp_float(leaves[0].dtype)) * scale
        return [
            jax.lax.dynamic_slice(flat, (o,), (s,)).reshape(l.shape).astype(l.dtype)
            for o, s, l in zip(offsets, sizes, leaves)
        ]

    return jax.tree_util.tree_unflatten(treedef, gen(rng))


def jnp_float(dtype):
    import jax.numpy as jnp

    d = jnp.dtype(dtype)
    return d if d.kind == "f" else jnp.float32
