"""Device meshes and sharding helpers.

The reference's "distributed" story is one process per GPU plus a
`process_id`-namespaced file side channel (`process_id.py:1`,
`scripts/txt2img-gpt.py:234-239`; SURVEY §2.5).  TPU-native replacement:
one SPMD program over a `Mesh(('data', 'model'))` —

  * `data`  : prompts (the workload's embarrassing axis).  Per-prompt
    weight optimization is independent, so the only cross-chip traffic on
    this axis is the initial parameter broadcast.
  * `model` : tensor parallelism inside the UNet/CLIP (attention heads and
    MLP hidden), for latency headroom when a single prompt must go fast.

All collectives are inserted by GSPMD from sharding annotations; they ride
ICI within a slice.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.  data=None → use all remaining."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} > {n} devices")
    grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch/prompt) axis on 'data'."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every array in the pytree with its batch axis on 'data'."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), tree
    )


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree
    )
