"""Checkpoint save/resume.

Reference: train.py:552-565 (torch.save of {'iter', 'model_state_dict',
'optimizer_state_dict', 'training_time_seconds'} as pointnet_ckpt_{iter}.pkl)
and util.py:44-101 (find_max_epoch: 'max' / 'all' / 'best' selection, where
'best' reads the gathered eval pickle and picks the lowest-CD iteration).

Orbax-backed; directory names keep the reference's `pointnet_ckpt_{iter}`
convention so tooling that scans for iterations keeps working.
"""

from __future__ import annotations

import json
import os
import pickle
import re
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

CKPT_PREFIX = "pointnet_ckpt"


def _ckpt_dir(path: str, it: int) -> str:
    return os.path.join(path, f"{CKPT_PREFIX}_{it}")


def _is_prng_key(x) -> bool:
    try:
        return jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)
    except (AttributeError, TypeError):
        return False


def _unwrap_keys(tree):
    """Typed PRNG keys are not serializable; store their raw uint32 data."""
    return jax.tree_util.tree_map(
        lambda x: np.asarray(jax.random.key_data(x)) if _is_prng_key(x) else np.asarray(x),
        tree,
    )


def _rewrap_keys(restored, example):
    return jax.tree_util.tree_map(
        lambda r, e: jax.random.wrap_key_data(r) if _is_prng_key(e) else r,
        restored,
        example,
    )


def save_checkpoint(
    path: str,
    it: int,
    state: Any,
    training_time_seconds: float = 0.0,
    keep_only_best: bool = False,
    best_path: Optional[str] = None,
):
    """Write a checkpoint at iteration `it`."""
    os.makedirs(path, exist_ok=True)
    target = _ckpt_dir(path, it)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(target), _unwrap_keys(state), force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(target, "meta.json"), "w") as f:
        json.dump({"iter": it, "training_time_seconds": training_time_seconds}, f)
    return target


def find_max_epoch(path: str, mode: str = "max", eval_result_path: Optional[str] = None):
    """Scan for saved iterations (util.py:44-101).

    mode='max' -> latest iteration (or -1); 'all' -> sorted desc list;
    'best' -> iteration with the lowest avg test CD from the gathered eval
    results file.
    """
    if not os.path.isdir(path):
        return -1 if mode != "all" else []
    iters = []
    pat = re.compile(rf"^{CKPT_PREFIX}_(\d+)$")
    for f in os.listdir(path):
        m = pat.match(f)
        if m and "best" not in f:
            iters.append(int(m.group(1)))
    if mode == "max":
        return max(iters) if iters else -1
    if mode == "all":
        return sorted(iters, reverse=True)
    if mode == "best":
        eval_file = eval_result_path or os.path.join(
            path, "../../eval_result/gathered_eval_result.pkl"
        )
        with open(eval_file, "rb") as f:
            data = pickle.load(f)
        cd = np.asarray(data["avg_cd"])
        idx = int(np.argmin(cd))
        return int(data["iter"][idx])
    raise ValueError(f"{mode} mode is not supported")


def load_checkpoint(path: str, it: int, example_state: Any):
    """Restore the state saved at iteration `it`, shaped like
    `example_state`.  Returns (state, training_time_seconds)."""
    target = _ckpt_dir(path, it)
    ckptr = ocp.StandardCheckpointer()
    unwrapped_example = _unwrap_keys(example_state)
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        unwrapped_example,
    )
    state = ckptr.restore(os.path.abspath(target), abstract)
    state = _rewrap_keys(state, example_state)
    secs = 0.0
    meta = os.path.join(target, "meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            secs = json.load(f).get("training_time_seconds", 0.0)
    return state, secs


def maybe_resume(path: str, ckpt_iter, example_state: Any):
    """ckpt_iter='max' or an int; returns (state or None, iter, seconds)
    falling back to fresh init like train.py:389-412."""
    if ckpt_iter == "max":
        ckpt_iter = find_max_epoch(path, "max")
    if ckpt_iter is None or int(ckpt_iter) < 0:
        return None, -1, 0.0
    try:
        state, secs = load_checkpoint(path, int(ckpt_iter), example_state)
        return state, int(ckpt_iter), secs
    except Exception as e:  # corrupt/missing -> fresh init (train.py:407-409)
        print(f"No valid checkpoint model found ({e}); training from scratch.")
        return None, -1, 0.0
