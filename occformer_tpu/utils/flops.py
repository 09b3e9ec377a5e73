"""Analytic FLOP counting from first principles (VERDICT r2 item #3).

Replaces reference ``tools/get_flops.py`` (mmcv FlopCountAnalysis) with a
count that is *defensible on TPU*: walk the traced jaxpr and sum, over every
compute-bearing primitive, the textbook FLOP formula at its exact traced
shapes —

  * ``dot_general`` (all matmuls / attention einsums):  2·B·M·N·K
  * ``conv_general_dilated``:  2·|out|·(kH·kW[·kD]·C_in/groups)
  * ``scatter-add`` family (the LSS voxel scatter):  |updates| adds

This deliberately counts only MACs-bearing ops (the MFU convention —
elementwise/softmax/norm FLOPs are bandwidth-bound on TPU and excluded from
utilization accounting).  It is NOT XLA's ``cost_analysis()`` number: that
one re-counts rematerialized/fused HLO and masked lanes, which is why it can
exceed hardware peak (NOTES.md r2 "2.87 TFLOP/frame at 188 f/s > v5e peak" —
physically impossible).  ``tools/model_analysis.py`` reports both and their
ratio.

Control flow: ``scan`` bodies are multiplied by trip count, ``cond``
branches take the max, ``while`` bodies are counted once and flagged in
``notes`` (trip count is data-dependent; no while_loop is on the model's
hot path).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Sequence

import jax
from jax.extend import core as jcore


def _aval_size(var) -> int:
    return int(math.prod(var.aval.shape))


def _dot_flops(eqn) -> int:
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs, rhs = eqn.invars[0].aval.shape, eqn.invars[1].aval.shape
    batch = math.prod(lhs[d] for d in lb)
    k = math.prod(lhs[d] for d in lc)
    m = math.prod(d for i, d in enumerate(lhs) if i not in set(lc) | set(lb))
    n = math.prod(d for i, d in enumerate(rhs) if i not in set(rc) | set(rb))
    return 2 * batch * m * n * k


def _conv_flops(eqn) -> int:
    dn = eqn.params["dimension_numbers"]
    kshape = eqn.invars[1].aval.shape
    out_elems = _aval_size(eqn.outvars[0])
    c_out = kshape[dn.rhs_spec[0]]
    # prod(kernel)/C_out = spatial · C_in/groups (groups already folded into
    # the kernel's input-feature dim)
    return 2 * out_elems * (math.prod(kshape) // c_out)


_SCATTER_PRIMS = {"scatter-add", "scatter", "scatter-mul", "scatter-min",
                  "scatter-max", "scatter_add"}
_CALL_JAXPR_KEYS = ("jaxpr", "call_jaxpr", "fun_jaxpr")


def _sub_jaxprs(eqn):
    for key in _CALL_JAXPR_KEYS:
        if key in eqn.params:
            j = eqn.params[key]
            yield j.jaxpr if isinstance(j, jcore.ClosedJaxpr) else j
    if "branches" in eqn.params:  # handled specially in _walk
        return


def _walk(jaxpr, counts: Dict[str, int], notes: list) -> None:
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            counts["dot"] += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            counts["conv"] += _conv_flops(eqn)
        elif name in _SCATTER_PRIMS:
            counts["scatter"] += _aval_size(eqn.invars[2])
        elif name == "scan":
            sub = {"dot": 0, "conv": 0, "scatter": 0}
            _walk(eqn.params["jaxpr"].jaxpr, sub, notes)
            length = eqn.params["length"]
            for k, v in sub.items():
                counts[k] += v * length
        elif name == "while":
            sub = {"dot": 0, "conv": 0, "scatter": 0}
            _walk(eqn.params["body_jaxpr"].jaxpr, sub, notes)
            # a compute-bearing cond (e.g. a convergence check with a
            # reduction/matmul) must not be silently dropped
            _walk(eqn.params["cond_jaxpr"].jaxpr, sub, notes)
            if any(sub.values()):
                notes.append(
                    f"while_loop body+cond counted once ({sum(sub.values())} "
                    "flops); trip count is data-dependent")
            for k, v in sub.items():
                counts[k] += v
        elif name == "cond":
            best = None
            for br in eqn.params["branches"]:
                sub = {"dot": 0, "conv": 0, "scatter": 0}
                _walk(br.jaxpr, sub, notes)
                if best is None or sum(sub.values()) > sum(best.values()):
                    best = sub
            for k, v in (best or {}).items():
                counts[k] += v
        else:
            for sub in _sub_jaxprs(eqn):
                _walk(sub, counts, notes)


def count_flops(fn, *args, **kwargs) -> Dict[str, Any]:
    """Trace ``fn(*args)`` (no compile, no execution) and return the analytic
    FLOP breakdown: ``{"dot", "conv", "scatter", "total", "notes"}``."""
    closed = jax.make_jaxpr(fn, **kwargs)(*args)
    counts = {"dot": 0, "conv": 0, "scatter": 0}
    notes: list = []
    _walk(closed.jaxpr, counts, notes)
    counts["total"] = sum(counts.values())
    return {**counts, "notes": notes}


# Peak dense-matmul throughput of the bench chip (TPU v5e / "v5 lite", the
# axon target): 197 TFLOP/s bf16.  MFU = achieved model FLOP/s over this.
TPU_V5E_PEAK_BF16 = 197e12


def mfu(model_flops_per_step: float, steps_per_sec: float,
        peak: float = TPU_V5E_PEAK_BF16) -> float:
    return model_flops_per_step * steps_per_sec / peak
