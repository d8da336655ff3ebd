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


def all_gather_host_arrays(x: np.ndarray) -> np.ndarray:
    """Gather per-host arrays (concatenated along axis 0) to every host.

    The TPU analogue of the per-rank pickle merge: each host contributes its
    dataset shard's metrics/clouds; everyone receives the full set.
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


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
