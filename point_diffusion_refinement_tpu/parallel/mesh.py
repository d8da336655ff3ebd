"""Device mesh construction and sharding rules.

Replaces the reference's NCCL process-group machinery (distributed.py:41-146:
init_process_group, hand-rolled bucketed gradient all-reduce, parameter
broadcast) with JAX SPMD: one jitted program over a `jax.sharding.Mesh`; XLA
inserts the gradient psum / parameter all-gathers on ICI automatically from
the sharding annotations.

Axes:
  data  — batch data parallelism (the reference's only strategy, §2.8).
  model — parameter sharding (FSDP-style): large Dense kernels are split on
          their output column so each chip stores 1/|model| of the weights;
          XLA all-gathers them on use and reduce-scatters the grads.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None, model_parallel: int = 1, devices=None
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: leading axis split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rule(mesh: Mesh, min_shard_dim: int = 128):
    """Return a function pytree-leaf -> NamedSharding implementing FSDP-style
    weight sharding: a kernel's trailing (output) dimension is split over the
    model axis when it is large enough and divisible; everything else is
    replicated."""
    m = mesh.shape[MODEL_AXIS]

    def rule(leaf: jax.ShapeDtypeStruct) -> NamedSharding:
        shape = leaf.shape
        if (
            m > 1
            and len(shape) >= 2
            and shape[-1] % m == 0
            and shape[-1] >= min_shard_dim
        ):
            spec = [None] * (len(shape) - 1) + [MODEL_AXIS]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return rule


def shard_params(params, mesh: Mesh, min_shard_dim: int = 128):
    """Place a parameter pytree on the mesh under the FSDP rule."""
    rule = param_sharding_rule(mesh, min_shard_dim)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rule(jax.ShapeDtypeStruct(x.shape, x.dtype))),
        params,
    )


def shard_batch(batch, mesh: Mesh):
    """Place batch arrays on the mesh split over the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def pad_batch_rows(arr: np.ndarray, multiple: int) -> np.ndarray:
    """Pad the leading (batch) axis up to a multiple by repeating the last
    row, so a ragged final batch still divides over the mesh's data axis.
    The outputs computed for the padding rows are dropped by the caller —
    the same resample-to-pad trick the reference dataset uses for its last
    rank (mvp_dataset.py:172-208)."""
    arr = np.asarray(arr)
    rem = arr.shape[0] % multiple
    if rem == 0:
        return arr
    pad = multiple - rem
    return np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)], axis=0)
