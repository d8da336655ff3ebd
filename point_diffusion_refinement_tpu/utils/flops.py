"""Analytic FLOP accounting for the benchmarks (MFU reporting).

Two sources:

* ``dot_flops``: trace a function to a jaxpr and sum ``dot_general`` FLOPs,
  classified into

    - ``model``  — the network's own matmuls (Dense / attention / einsum), and
    - ``gather`` — structural one-hot gather contractions (the TPU encoding
      of neighbor gathers, ops/sampling.py): one operand originates from a
      ``one_hot`` (eq + convert) chain.  These FLOPs exist only because
      gathers ride the MXU; they are excluded from the "model FLOPs" number
      so MFU is not inflated by structural work.

* ``pallas_flops_tally``: Pallas kernels are opaque custom calls (XLA cost
  analysis reports 0 for them), so the windowed grouping/kNN kernels record
  their analytic in-kernel MAC counts at trace time into a module-level
  tally (ops/pallas_window.py); ``pallas_flops_tally`` scopes and reads it.

The v5e peak constant is the public bf16 number for one TPU v5e chip.
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax
import numpy as np

V5E_BF16_PEAK_FLOPS = 197e12  # per chip

# trace-time tally the pallas wrappers append (mac_count) entries to
_PALLAS_TALLY: list = []


def record_pallas_macs(macs: float) -> None:
    _PALLAS_TALLY.append(float(macs))


@contextlib.contextmanager
def pallas_flops_tally():
    """Scope a trace; yields a dict whose 'flops' is filled on exit with
    2 * the in-kernel MACs recorded during the scope."""
    start = len(_PALLAS_TALLY)
    out = {}
    try:
        yield out
    finally:
        out["flops"] = 2.0 * sum(_PALLAS_TALLY[start:])
        del _PALLAS_TALLY[start:]


def _dim_numbers_flops(eqn, shapes) -> float:
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lshape, rshape = shapes
    batch = float(np.prod([lshape[d] for d in lb], dtype=np.float64)) if lb else 1.0
    contract = float(np.prod([lshape[d] for d in lc], dtype=np.float64)) if lc else 1.0
    lfree = float(
        np.prod(
            [s for d, s in enumerate(lshape) if d not in lc and d not in lb],
            dtype=np.float64,
        )
    )
    rfree = float(
        np.prod(
            [s for d, s in enumerate(rshape) if d not in rc and d not in rb],
            dtype=np.float64,
        )
    )
    return 2.0 * batch * contract * lfree * rfree


_PASSTHROUGH = {
    "convert_element_type",
    "broadcast_in_dim",
    "reshape",
    "transpose",
    "squeeze",
    "slice",
    "stop_gradient",
    "copy",
}


def _origin_primitive(var, defs, depth: int = 8):
    """Walk back through layout-only ops to the defining primitive name."""
    for _ in range(depth):
        eqn = defs.get(id(var))
        if eqn is None:
            return None
        name = eqn.primitive.name
        if name in _PASSTHROUGH and eqn.invars:
            var = eqn.invars[0]
            continue
        return name
    return None


def _walk(jaxpr, mult: float, out: dict, defs_outer=None):
    defs = {}
    for eqn in jaxpr.eqns:
        for v in eqn.outvars:
            defs[id(v)] = eqn
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            shapes = [v.aval.shape for v in eqn.invars]
            flops = _dim_numbers_flops(eqn, shapes) * mult
            is_gather = False
            for v in eqn.invars:
                if _origin_primitive(v, defs) in ("eq", "select_n"):
                    is_gather = True
                    break
            out["gather" if is_gather else "model"] += flops
        elif name == "scan":
            inner = eqn.params["jaxpr"].jaxpr
            _walk(inner, mult * float(eqn.params["length"]), out)
        elif name == "while":
            # no static trip count: count the body once (not used on the
            # benched paths)
            _walk(eqn.params["body_jaxpr"].jaxpr, mult, out)
        elif name == "cond":
            # count the most expensive branch
            best = None
            for br in eqn.params["branches"]:
                sub = {"model": 0.0, "gather": 0.0}
                _walk(br.jaxpr, mult, sub)
                if best is None or sum(sub.values()) > sum(best.values()):
                    best = sub
            if best:
                out["model"] += best["model"]
                out["gather"] += best["gather"]
        else:
            for key in ("jaxpr", "call_jaxpr"):
                sub = eqn.params.get(key) if hasattr(eqn, "params") else None
                if sub is not None:
                    _walk(getattr(sub, "jaxpr", sub), mult, out)
                    break


def dot_flops(fn: Callable, *args, **kwargs) -> dict:
    """Trace ``fn(*args, **kwargs)`` and return
    {'model': flops, 'gather': flops, 'pallas': flops} — pallas from the
    trace-time tally the windowed kernels record."""
    out = {"model": 0.0, "gather": 0.0}
    with pallas_flops_tally() as tally:
        jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    _walk(jaxpr.jaxpr, 1.0, out)
    out["pallas"] = tally["flops"]
    return out
