"""Shared SPMD plumbing for the Pallas kernels.

An un-annotated `pallas_call` under GSPMD/Shardy is replicated: the
partitioner inserts an all-gather and every chip runs the full batch.
All kernels in this package are batch-row-parallel with broadcast
weights, so each wraps its pallas entry in `custom_partitioning` with a
rule built here.  Two facts shape the design (docs/DESIGN.md):

  * custom_partitioning is opaque to autodiff — the wrappers must sit
    INSIDE each op's custom_vjp, never above it;
  * statics declared via static_argnums are PREPENDED to the partition
    callback's arguments.
"""
from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec


def ctx_mesh():
    """The Mesh installed by an enclosing `with mesh:` block, or None.

    jax 0.9: `with mesh:` populates the legacy thread-local context (what
    bare-PartitionSpec `with_sharding_constraint` resolves against); the
    new `get_abstract_mesh` stays empty unless explicit-sharding mode is
    on, so the legacy context is the one to inspect.
    """
    try:
        from jax._src import mesh as mesh_lib

        m = mesh_lib.thread_resources.env.physical_mesh
        return None if m.empty else m
    except Exception:
        return None


def constrain(x, *spec):
    """`with_sharding_constraint(x, P(*spec))` if a mesh is in context,
    identity otherwise (single-chip traces stay annotation-free).

    Axis names absent from the context mesh, and dims the mesh axis does
    not divide evenly, are demoted to None — callers write the ideal spec
    once and it degrades gracefully on data-only or odd-sized meshes.
    GSPMD otherwise invents mixed shardings for the blend intermediates
    (seen: involuntary full rematerialization of the local-context
    tensors in `attn2.controlled` on a ('data','model') mesh).
    """
    m = ctx_mesh()
    if m is None:
        return x
    fixed = []
    for dim, s in zip(x.shape, spec):
        ok = (s is not None and s in m.axis_names
              and dim % m.shape[s] == 0 and dim >= m.shape[s])
        fixed.append(s if ok else None)
    if not any(s is not None for s in fixed):
        return x
    return jax.lax.with_sharding_constraint(x, PartitionSpec(*fixed))


def batch_partition(row_arg_idxs, make_lower, n_results=1):
    """partition callback for a batch-row-parallel kernel.

    Operands whose index is in `row_arg_idxs` keep their leading-dim
    sharding (taken from the first of them); everything else replicates;
    results shard on their leading dim the same way.  `make_lower(*statics)`
    must return the local lowering function.
    """
    row_arg_idxs = tuple(row_arg_idxs)

    def partition(*args):
        *statics, mesh, arg_shapes, result_shape = args
        spec0 = arg_shapes[row_arg_idxs[0]].sharding.spec
        b = spec0[0] if len(spec0) else None

        def sh(s, rowed):
            lead = b if rowed else None
            return NamedSharding(mesh, PartitionSpec(
                lead, *([None] * (len(s.shape) - 1))))

        arg_sh = tuple(sh(s, i in row_arg_idxs)
                       for i, s in enumerate(arg_shapes))
        res_sh = (sh(result_shape, True) if n_results == 1
                  else tuple(sh(s, True) for s in result_shape))
        return mesh, make_lower(*statics), res_sh, arg_sh

    return partition
