"""Three-nearest-neighbor interpolation, XLA-native.

Reference: pointnet2_ops/_ext-src/src/interpolate_gpu.cu (brute-force 3-NN at
lines 9-59; inverse-distance-weighted 3-point interpolation with atomic-add
gradient at 72-154) and the wrappers ThreeNN / ThreeInterpolate in
pointnet2_utils.py:132-219.  On TPU the scatter-add backward is produced
automatically by XLA's VJP of the gather, so no custom kernel is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .neighbors import knn


def three_nn(unknown: jax.Array, known: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Find 3 nearest neighbors of each `unknown` point among `known`.

    Returns (dist, idx): euclidean (not squared) distances and indices,
    both (B, n, 3) — matching pointnet2_utils.py:152-157 which sqrt's the
    kernel's squared distances.
    """
    d2, idx = knn(unknown, known, 3)
    return jnp.sqrt(d2), idx


def three_interpolate(features: jax.Array, idx: jax.Array, weight: jax.Array) -> jax.Array:
    """Weighted sum of 3 neighbor features.

    Args:
      features: (B, m, C) features at `known` points (channels-last).
      idx: (B, n, 3) neighbor indices.
      weight: (B, n, 3) interpolation weights.

    Returns:
      (B, n, C).
    """
    B, n, three = idx.shape
    g = features[jnp.arange(B)[:, None, None], idx, :]  # (B, n, 3, C)
    return jnp.sum(g * weight[..., None], axis=2)


def inverse_distance_weights(dist: jax.Array, eps: float = 1e-8) -> jax.Array:
    """1/(d+eps) normalized over the last axis (PointnetFPModule forward,
    pointnet2_modules.py:537-540)."""
    recip = 1.0 / (dist + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)
