"""Eval-result bookkeeping: per-checkpoint metric pickles, gathering across
iterations, and loss-vs-iteration curve plots.

Reference: completion_eval.py:363-424 (gather_eval_result_of_different_iters)
and eval/plot_result.py:16-58 / eval/compare_eval_result.py:16-54.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np


def save_eval_result(path: str, it: int, avg_cd: float, avg_emd: float,
                     metrics: Optional[dict] = None):
    """Write eval_result_ckpt_{it}.pkl next to the gathered file."""
    os.makedirs(path, exist_ok=True)
    payload = {"iter": it, "avg_cd": avg_cd, "avg_emd": avg_emd}
    if metrics:
        payload["metrics"] = {k: np.asarray(v) for k, v in metrics.items()}
    with open(os.path.join(path, f"eval_result_ckpt_{it}.pkl"), "wb") as f:
        pickle.dump(payload, f)


def gather_eval_results(path: str, out_name: str = "gathered_eval_result.pkl") -> dict:
    """Merge all eval_result_ckpt_*.pkl into the gathered schema that
    find_max_epoch(mode='best') consumes (util.py:82-93)."""
    records = []
    for f in sorted(os.listdir(path)):
        # skip per-rank shard pickles (eval_result_ckpt_{it}_rank_{r}[...].pkl);
        # only the gathered per-iteration files carry global averages
        if f.startswith("eval_result_ckpt_") and f.endswith(".pkl") and "_rank_" not in f:
            with open(os.path.join(path, f), "rb") as fh:
                records.append(pickle.load(fh))
    records.sort(key=lambda r: r["iter"])
    gathered = {
        "iter": [r["iter"] for r in records],
        "avg_cd": [r["avg_cd"] for r in records],
        "avg_emd": [r["avg_emd"] for r in records],
    }
    with open(os.path.join(path, out_name), "wb") as f:
        pickle.dump(gathered, f)
    return gathered


def plot_result(
    gathered: dict, keys=("avg_cd", "avg_emd"), save_path: Optional[str] = None
):
    """Loss-vs-iteration curves with the minimum marked
    (eval/plot_result.py:16-58).  No-op if matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    iters = gathered["iter"]
    fig, axes = plt.subplots(1, len(keys), figsize=(6 * len(keys), 4))
    if len(keys) == 1:
        axes = [axes]
    for ax, key in zip(axes, keys):
        vals = np.asarray(gathered[key])
        ax.plot(iters, vals, marker="o", ms=3)
        best = int(np.argmin(vals))
        ax.scatter([iters[best]], [vals[best]], color="red")
        ax.set_title(f"{key} (min {vals[best]:.6f} @ {iters[best]})")
        ax.set_xlabel("iteration")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return save_path


def compare_eval_results(gathered_list: list[dict], names: list[str],
                         key: str = "avg_cd", save_path: Optional[str] = None):
    """Overlay curves from multiple experiments
    (eval/compare_eval_result.py:16-54)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for g, name in zip(gathered_list, names):
        vals = np.asarray(g[key])
        best = int(np.argmin(vals))
        ax.plot(g["iter"], vals, label=f"{name} (min {vals[best]:.6f})")
    ax.set_xlabel("iteration")
    ax.set_ylabel(key)
    ax.legend()
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return save_path
