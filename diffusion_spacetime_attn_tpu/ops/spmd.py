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

from jax.sharding import NamedSharding, PartitionSpec


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
