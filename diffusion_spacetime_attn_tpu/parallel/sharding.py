"""Parameter partition rules (tensor parallelism) for the model zoo.

Megatron-style TP expressed as GSPMD sharding annotations: the first linear
of each attention/MLP pair is column-parallel (output features on 'model'),
the second is row-parallel (input features on 'model'); everything else is
replicated.  Applies to UNet transformer blocks and CLIP encoder layers.
Convolutions / norms stay replicated — on this workload they are small
relative to attention/MLP and GroupNorm(32) would force awkward channel
collectives.

Param pytrees here are flax dicts; rules match on path substrings.
"""
from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path substrings that must all appear, param name, spec for its last dims)
# Dense kernels are [in, out]; Embed is [vocab, dim].
_COLUMN = P(None, "model")   # shard outputs
_ROW = P("model", None)      # shard inputs
_REP = P()

_RULES: Tuple[Tuple[Tuple[str, ...], str, P], ...] = (
    # UNet / CLIP attention: q,k,v column-parallel, out row-parallel
    (("to_q", "kernel"), "kernel", _COLUMN),
    (("to_k", "kernel"), "kernel", _COLUMN),
    (("to_v", "kernel"), "kernel", _COLUMN),
    (("to_out", "kernel"), "kernel", _ROW),
    (("q_proj", "kernel"), "kernel", _COLUMN),
    (("k_proj", "kernel"), "kernel", _COLUMN),
    (("v_proj", "kernel"), "kernel", _COLUMN),
    (("out_proj", "kernel"), "kernel", _ROW),
    # MLPs: in column-parallel, out row-parallel
    (("ff", "proj_in", "kernel"), "kernel", _COLUMN),
    (("ff", "proj_out", "kernel"), "kernel", _ROW),
    (("mlp", "fc1", "kernel"), "kernel", _COLUMN),
    (("mlp", "fc2", "kernel"), "kernel", _ROW),
)


def _spec_for_path(path: Tuple[str, ...], leaf) -> P:
    joined = "/".join(path)
    for substrings, _, spec in _RULES:
        if all(s in joined for s in substrings):
            # only shard if the dimension divides evenly; GSPMD requires it
            return spec
    return _REP


def partition_specs(params):
    """PartitionSpec pytree matching a flax param dict."""

    def leaf_spec(path, leaf):
        names = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        spec = _spec_for_path(names, leaf)
        # sanity: only apply 2D specs to 2D params
        if spec != _REP and leaf.ndim != 2:
            return _REP
        return spec

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def shard_params(mesh: Mesh, params, model_axis_size: int):
    """device_put params with TP specs (divisibility-checked per leaf)."""

    def place(path, leaf):
        names = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        spec = _spec_for_path(names, leaf)
        if spec != _REP and leaf.ndim == 2:
            dim = 1 if spec == _COLUMN else 0
            if leaf.shape[dim] % model_axis_size == 0:
                return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, NamedSharding(mesh, _REP))

    return jax.tree_util.tree_map_with_path(place, params)


def fsdp_sharding(mesh: Mesh, tree, axis: str = "data"):
    """ZeRO/FSDP-style shardings for a train-state pytree: every array
    leaf is sharded along its largest axis divisible by the mesh's data
    size (weights, optimizer moments, EMA alike); indivisible or scalar
    leaves replicate.  GSPMD then materializes each parameter via
    all-gather at its use sites and reduce-scatters its gradient — per-chip
    state memory drops ~n_data× while the step stays one jitted program.

    Returns a pytree of NamedShardings matching `tree` (pass as jit
    in_shardings/out_shardings and to jax.device_put for the initial
    placement)."""
    n = mesh.shape[axis]

    def leaf_sharding(leaf):
        shape = getattr(leaf, "shape", ())
        cands = [i for i, s in enumerate(shape) if s % n == 0 and s >= n]
        if not cands:
            return NamedSharding(mesh, _REP)
        best = max(cands, key=lambda i: shape[i])
        spec = [None] * len(shape)
        spec[best] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(leaf_sharding, tree)
