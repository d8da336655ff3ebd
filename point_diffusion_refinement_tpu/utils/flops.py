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

# trace-time tally the pallas wrappers append (mac_count) entries to;
# recording is a no-op unless a pallas_flops_tally scope is active, so
# ordinary jit compiles / eval_shape traces outside the accounting scope
# don't grow the module-global list
_PALLAS_TALLY: list = []
_TALLY_DEPTH: int = 0


def record_pallas_macs(macs: float) -> None:
    if _TALLY_DEPTH > 0:
        _PALLAS_TALLY.append(float(macs))


@contextlib.contextmanager
def pallas_flops_tally():
    """Scope a trace; yields a dict whose 'flops' is filled on exit with
    2 * the in-kernel MACs recorded during the scope.

    Caveat: pallas MACs are recorded once per trace of the kernel call.  If a
    windowed kernel is traced inside a ``lax.scan`` body, the record is NOT
    scaled by the trip count (dot_general FLOPs are) — apply ``dot_flops`` to
    a single unrolled step, as the benches do.
    """
    global _TALLY_DEPTH
    start = len(_PALLAS_TALLY)
    out = {}
    _TALLY_DEPTH += 1
    try:
        yield out
    finally:
        _TALLY_DEPTH -= 1
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


def _subjaxpr(eqn):
    """The nested jaxpr of a call-like eqn (pjit, closed_call, remat, custom
    derivative wrappers), or None."""
    if not hasattr(eqn, "params"):
        return None
    for key in ("jaxpr", "call_jaxpr"):
        sub = eqn.params.get(key)
        if sub is not None:
            return getattr(sub, "jaxpr", sub)
    return None


def _index_jaxpr(jaxpr, defs: dict, alias: dict) -> None:
    """Build a GLOBAL var index across nested jaxprs so origin walks cross
    pjit boundaries (jax.nn.one_hot and jnp.einsum are internally
    jit-wrapped, so the ``eq`` producing a one-hot lives in a sub-jaxpr of
    the dot's operand).  ``defs``: id(var) -> defining eqn.  ``alias``:
    id(inner invar) -> the outer operand var feeding it."""
    for eqn in jaxpr.eqns:
        for v in eqn.outvars:
            defs[id(v)] = eqn
        sub = _subjaxpr(eqn)
        if sub is not None:
            # scan invars = consts + carry + xs (sliced); arity still lines
            # up 1:1 from the back for classification purposes — only
            # primitive NAMES are consumed downstream, shapes never are
            n = min(len(sub.invars), len(eqn.invars))
            for iv, ov in zip(sub.invars[-n:], eqn.invars[-n:]):
                alias[id(iv)] = ov
            _index_jaxpr(sub, defs, alias)


def _origin_primitive(var, defs, alias, depth: int = 32):
    """Walk back through layout-only ops AND call boundaries to the defining
    primitive name."""
    for _ in range(depth):
        while id(var) in alias:
            var = alias[id(var)]
        eqn = defs.get(id(var))
        if eqn is None:
            return None
        sub = _subjaxpr(eqn)
        if sub is not None:
            # descend: the call's outvar corresponds positionally to the
            # sub-jaxpr's outvar
            idx = next(
                (i for i, v in enumerate(eqn.outvars) if id(v) == id(var)),
                None,
            )
            if idx is None or idx >= len(sub.outvars):
                return eqn.primitive.name
            var = sub.outvars[idx]
            continue
        name = eqn.primitive.name
        if name in _PASSTHROUGH and eqn.invars:
            var = eqn.invars[0]
            continue
        return name
    return None


def _walk(jaxpr, mult: float, out: dict, defs: dict, alias: dict):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            shapes = [v.aval.shape for v in eqn.invars]
            flops = _dim_numbers_flops(eqn, shapes) * mult
            is_gather = False
            for v in eqn.invars:
                if _origin_primitive(v, defs, alias) in ("eq", "select_n"):
                    is_gather = True
                    break
            out["gather" if is_gather else "model"] += flops
        elif name == "scan":
            inner = eqn.params["jaxpr"].jaxpr
            _walk(inner, mult * float(eqn.params["length"]), out, defs, alias)
        elif name == "while":
            # no static trip count: count the body once (not used on the
            # benched paths)
            _walk(eqn.params["body_jaxpr"].jaxpr, mult, out, defs, alias)
        elif name == "cond":
            # count the most expensive branch
            best = None
            for br in eqn.params["branches"]:
                sub = {"model": 0.0, "gather": 0.0}
                _walk(br.jaxpr, mult, sub, defs, alias)
                if best is None or sum(sub.values()) > sum(best.values()):
                    best = sub
            if best:
                out["model"] += best["model"]
                out["gather"] += best["gather"]
        else:
            sub = _subjaxpr(eqn)
            if sub is not None:
                _walk(sub, mult, out, defs, alias)


def dot_flops(fn: Callable, *args, **kwargs) -> dict:
    """Trace ``fn(*args, **kwargs)`` and return
    {'model': flops, 'gather': flops, 'pallas': flops} — pallas from the
    trace-time tally the windowed kernels record.

    Apply to a SINGLE unrolled step: dot_general FLOPs inside ``lax.scan``
    are scaled by the trip count, but the pallas trace-time records are not
    (a kernel traced in a scan body records its MACs once)."""
    out = {"model": 0.0, "gather": 0.0}
    with pallas_flops_tally() as tally:
        jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    defs: dict = {}
    alias: dict = {}
    _index_jaxpr(jaxpr.jaxpr, defs, alias)
    _walk(jaxpr.jaxpr, 1.0, out, defs, alias)
    out["pallas"] = tally["flops"]
    return out
