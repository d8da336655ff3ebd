"""Mirror-and-concat preprocessing of partial clouds.

Reference: pointnet2/data_utils/mirror_partial.py:5-37 +
mvp_dataloader/generate_mirrored_partial.py: reflect the partial across the
xy-plane (negate z), tag original points +1 / mirrored -1 in a 4th channel,
concatenate to 2N points, and FPS-downsample to the target count.  The FPS
runs on-device as one jitted batch instead of the reference's per-batch CUDA
round trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import furthest_point_sample, gather_points


@functools.partial(jax.jit, static_argnums=(1, 2))
def mirror_and_concat(
    partial: jax.Array, num_points: int, axis: int = 2
) -> jax.Array:
    """(B, N, 3) partials -> (B, num_points, 4) mirrored+tagged+FPS'd.

    The mirror flag channel is +1 for original points, -1 for reflected ones.
    """
    B, N, _ = partial.shape
    sign = jnp.ones((3,), partial.dtype).at[axis].set(-1.0)
    mirrored = partial * sign
    flags = jnp.ones((B, N, 1), partial.dtype)
    both = jnp.concatenate(
        [
            jnp.concatenate([partial, flags], axis=-1),
            jnp.concatenate([mirrored, -flags], axis=-1),
        ],
        axis=1,
    )  # (B, 2N, 4)
    idx = furthest_point_sample(both[..., :3], num_points)
    return gather_points(both, idx)


def generate_mirrored_partials(
    partials: np.ndarray, num_points: int, batch_size: int = 64, axis: int = 2
) -> np.ndarray:
    """Host driver over a big array of partials (the h5 preprocessing pass,
    generate_mirrored_partial.py:51-74)."""
    out = []
    for i in range(0, partials.shape[0], batch_size):
        chunk = jnp.asarray(partials[i : i + batch_size], dtype=jnp.float32)
        out.append(np.asarray(mirror_and_concat(chunk, num_points, axis)))
    return np.concatenate(out, axis=0)
