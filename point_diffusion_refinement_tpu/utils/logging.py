"""Minimal scalar logger: TensorBoard if available, else JSONL.

Reference: train.py:329-330, 546-549 (SummaryWriter scalars).  torch's
tensorboard writer is used when importable; otherwise scalars append to a
JSONL file so headless environments still record the training curves.
"""

from __future__ import annotations

import json
import os
import time


class TensorBoardLogger:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, global_step=None):
        if self._tb is not None:
            self._tb.add_scalar(tag, value, global_step=global_step)
        else:
            self._jsonl.write(
                json.dumps(
                    {"tag": tag, "value": float(value), "step": global_step,
                     "time": time.time()}
                )
                + "\n"
            )
            self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        else:
            self._jsonl.close()


# ---------------------------------------------------------------------------
# One-shot perf-drift warnings.
#
# The windowed fused ball-query+gather fast path (ops/pallas_window.py) has
# eligibility predicates (M % 128, bf16 compute, radius neighborhoods,
# matching enc/dec FT geometry).  A config drifting off any of these silently
# ran ~2x slower with no log line; these helpers emit ONE trace-time warning
# naming the failed predicate.  Size floors (support < 1024 points) stay
# silent: the shipped config's coarse levels fall back by design, and at
# those sizes the fast path would not pay anyway.
# ---------------------------------------------------------------------------

_WARNED: set = set()


def warn_once(key: str, message: str) -> None:
    """Emit ``message`` as a UserWarning the first time ``key`` is seen."""
    if key in _WARNED:
        return
    _WARNED.add(key)
    import warnings

    warnings.warn(message, UserWarning, stacklevel=3)


def reset_warn_once() -> None:
    """Clear the warn-once cache (tests)."""
    _WARNED.clear()
