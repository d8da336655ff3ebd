"""Profiling / tracing hooks.

Reference: the original only wall-clock-times generation batches
(completion_eval.py:157,200-201,263-265).  Here we expose the JAX profiler
(device traces viewable in TensorBoard/Perfetto) plus a simple step-time
meter, and a helper that aggregates per-op device time from a captured
trace — the workflow used to find the sort/gather hot spots in this repo.
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import time
from collections import Counter
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with trace('/tmp/trace'): run_steps()`."""
    with jax.profiler.trace(log_dir):
        yield


def summarize_trace(
    log_dir: str, top: int = 25, long_names: bool = False
) -> list[tuple[str, float, int]]:
    """Aggregate (op name, total us, count) from a captured trace directory.

    With ``long_names`` the XLA long op name (the jaxpr scope path, e.g.
    `.../sa_0/ConditionedMLP_0/...`) is appended when the trace carries it —
    use it to attribute anonymous `fusion.NNNN` entries to model modules.
    """
    files = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        return []
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    tot: Counter = Counter()
    cnt: Counter = Counter()
    for e in data.get("traceEvents", []):
        name = e.get("name", "")
        if e.get("ph") == "X" and "dur" in e and not name.startswith("$"):
            if long_names:
                args = e.get("args") or {}
                ln = args.get("long_name") or args.get("hlo_op") or ""
                if ln and ln != name:
                    name = f"{name} :: {ln}"
            tot[name] += e["dur"]
            cnt[name] += 1
    return [(name, float(d), cnt[name]) for name, d in tot.most_common(top)]


class StepTimer:
    """Blocking step-time meter with warmup discard."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list[float] = []
        self._seen = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    @property
    def best(self) -> float:
        return min(self.times) if self.times else float("nan")
