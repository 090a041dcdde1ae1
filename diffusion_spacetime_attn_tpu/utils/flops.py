"""Analytic FLOP accounting by jaxpr traversal.

Counts MXU work (dot_general + conv_general_dilated) in a traced program,
recursing through scan (×length), cond (max over branches), pjit/remat/
custom-AD wrappers.  Tracing is abstract (`jax.make_jaxpr`) — no compile, no
device — so the count is exact program arithmetic, not an estimate: a
`jax.grad` program's backward matmuls are counted because they are right
there in the jaxpr.

Two caveats, both by design:
  * Only matmul/conv FLOPs are counted.  Elementwise/norm/softmax work is
    O(elements) and <1% of these programs' arithmetic; the MXU count is the
    denominator MFU wants.
  * `pallas_call` is opaque (kernel arithmetic is not in the jaxpr), so
    callers must count on the mathematically identical XLA path (the fused
    Pallas kernels replace einsums 1:1; `ops/pallas_*.py` oracle tests pin
    that equivalence).  A nonzero `opaque_pallas_calls` in the result means
    the count is a lower bound and the caller should switch the knobs off.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax


def _dot_general_flops(eqn) -> float:
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs, rhs = eqn.invars[0].aval.shape, eqn.invars[1].aval.shape
    batch = math.prod(lhs[d] for d in lb) if lb else 1
    contract = math.prod(lhs[d] for d in lc) if lc else 1
    m = math.prod(s for d, s in enumerate(lhs) if d not in lc and d not in lb)
    n = math.prod(s for d, s in enumerate(rhs) if d not in rc and d not in rb)
    return 2.0 * batch * m * n * contract


def _conv_flops(eqn) -> float:
    dn = eqn.params["dimension_numbers"]
    rhs = eqn.invars[1].aval.shape
    out = eqn.outvars[0].aval.shape
    groups = eqn.params.get("feature_group_count", 1)
    in_c = rhs[dn.rhs_spec[1]]  # per-group input channels
    spatial = math.prod(rhs[d] for d in dn.rhs_spec[2:])
    return 2.0 * math.prod(out) * in_c * spatial / max(groups, 1)


def _sub_jaxprs(eqn):
    """(jaxpr, multiplier) pairs for higher-order primitives."""
    name = eqn.primitive.name
    p = eqn.params
    if name == "scan":
        return [(p["jaxpr"].jaxpr, p["length"])]
    if name == "while":
        # trip count is dynamic; count one body iteration and flag it
        return [(p["body_jaxpr"].jaxpr, 1), (p["cond_jaxpr"].jaxpr, 1)]
    if name == "cond":
        return [(b.jaxpr, 1.0 / len(p["branches"])) for b in p["branches"]]
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        if key in p:
            j = p[key]
            return [(j.jaxpr if hasattr(j, "jaxpr") else j, 1)]
    return []


def jaxpr_flops(jaxpr) -> Dict[str, float]:
    """{'matmul': F, 'conv': F, 'total': F, 'opaque_pallas_calls': n,
    'dynamic_while_loops': n} for one (open) jaxpr."""
    out = {"matmul": 0.0, "conv": 0.0, "opaque_pallas_calls": 0,
           "dynamic_while_loops": 0}
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            out["matmul"] += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            out["conv"] += _conv_flops(eqn)
        elif name == "pallas_call":
            out["opaque_pallas_calls"] += 1
        else:
            if name == "while":
                out["dynamic_while_loops"] += 1
            for sub, mult in _sub_jaxprs(eqn):
                sub_counts = jaxpr_flops(sub)
                out["matmul"] += mult * sub_counts["matmul"]
                out["conv"] += mult * sub_counts["conv"]
                out["opaque_pallas_calls"] += sub_counts["opaque_pallas_calls"]
                out["dynamic_while_loops"] += sub_counts["dynamic_while_loops"]
    out["total"] = out["matmul"] + out["conv"]
    return out


def count_flops(fn, *args, **kwargs) -> Dict[str, Any]:
    """Trace `fn` abstractly and count its MXU FLOPs (see module doc)."""
    closed = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
    return jaxpr_flops(closed.jaxpr)
