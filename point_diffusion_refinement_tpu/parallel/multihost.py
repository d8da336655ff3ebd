"""Multi-host coordination helpers.

Replaces the reference's filesystem-based result gathering: per-rank pickles
merged by rank 0 (train.py:128-257) and per-rank h5 files discovered by
grepping rank 0's stdout log for the save directory
(generate_samples_distributed.py:205-234).  On a JAX multi-host deployment
the same data moves over the ICI/DCN collectives in one call.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize_distributed(**kwargs):
    """Join the multi-host runtime (replaces
    torch.distributed.init_process_group, distributed.py:47-57).  No-op on a
    single host."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:  # already initialized / single host
        print(f"jax.distributed.initialize skipped: {e}")


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def _gather_ragged(x: np.ndarray, allgather) -> np.ndarray:
    """Pad-to-max → allgather → trim-per-host → concat along axis 0.

    `process_allgather` requires identical shapes on every host, but test
    shards are ceil-divided (data/mvp.py) so the last host may hold fewer
    rows.  Gathering the true lengths first and padding to the global max
    makes the collective shape-uniform; the padding is trimmed per host
    after the gather.  Pure function (the collective is injected) so the
    ragged path is unit-testable on one host.
    """
    n = np.asarray([x.shape[0]], np.int64)
    lengths = np.asarray(allgather(n)).reshape(-1)
    max_n = int(lengths.max())
    if x.shape[0] < max_n:
        pad = np.zeros((max_n - x.shape[0],) + x.shape[1:], x.dtype)
        x = np.concatenate([x, pad], axis=0)
    gathered = np.asarray(allgather(x))  # (P, max_n, ...)
    return np.concatenate(
        [gathered[i, : int(lengths[i])] for i in range(len(lengths))], axis=0
    )


def all_gather_host_arrays(x: np.ndarray) -> np.ndarray:
    """Gather per-host arrays (concatenated along axis 0) to every host.

    The TPU analogue of the per-rank pickle merge: each host contributes its
    dataset shard's metrics/clouds; everyone receives the full set.  Hosts
    may hold different numbers of rows (ragged last shard) — rows are padded
    to the global max for the collective and trimmed after, unlike the
    reference which tolerates ragged ranks only because each writes its own
    pickle (train.py:128-257).
    """
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    if x.ndim == 0:
        return np.asarray(multihost_utils.process_allgather(x))
    return _gather_ragged(x, multihost_utils.process_allgather)


def barrier(name: str = "pdr_barrier"):
    """Cross-host sync (replaces torch.distributed.barrier,
    train.py:595,620)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def broadcast_scalar(value: float, root: int = 0) -> float:
    """Broadcast a host scalar from root to all hosts (replaces
    dist.broadcast of the test CD, train.py:623)."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    arr = np.asarray([value if jax.process_index() == root else 0.0], np.float32)
    out = multihost_utils.broadcast_one_to_all(arr, is_source=jax.process_index() == root)
    return float(out[0])
