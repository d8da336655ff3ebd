"""Neighborhood queries: ball query and k-nearest-neighbors, XLA-native.

Reference semantics:
  * ball query — pointnet2_ops/_ext-src/src/ball_query_gpu.cu:9-47: for each
    center, scan points in order and keep the first <= nsample points within
    `radius`; if fewer than nsample are found, the remaining slots repeat the
    first found neighbor; a per-center neighbor count is returned; centers with
    zero neighbors keep index 0.
  * kNN — pytorch3d `knn_points` used via pointnet2_utils.py:363-369, 487-514.

TPU design: the sequential scan becomes a single batched distance matrix
(an MXU matmul: ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b) followed by a
`lax.top_k` over a monotone key that ranks in-radius points by ascending
original index — this reproduces the CUDA "first K in scan order" semantics
exactly, with static shapes and no data-dependent control flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared euclidean distance matrix.

    Args:
      a: (..., M, 3)
      b: (..., N, 3)

    Returns:
      (..., M, N) squared distances.

    Implementation note: we deliberately do NOT use the |a|^2 - 2ab + |b|^2
    matmul identity.  Its float32 cancellation noise (~1e-6) breaks the exact
    semantics the reference's CUDA kernels provide (ball-query radius
    boundaries, zero self-distances in 3-NN interpolation).  And on TPU the
    identity buys nothing: the contraction depth is 3, so the 128x128 MXU
    would run ~2% utilized.  The per-coordinate broadcast-subtract form is
    exact (matches direct f32 subtraction) and maps onto the VPU with the
    (M, N) layout on (sublanes, lanes).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    d = None
    for c in range(a.shape[-1]):
        diff = a[..., :, None, c] - b[..., None, :, c]  # (..., M, N)
        d = diff * diff if d is None else d + diff * diff
    return d


@functools.partial(jax.jit, static_argnums=(2, 3))
def ball_query_xla(
    xyz: jax.Array, new_xyz: jax.Array, radius: float, nsample: int
) -> tuple[jax.Array, jax.Array]:
    """First-<=K-in-radius neighbor query with counts.

    Args:
      xyz: (B, N, 3) points to search.
      new_xyz: (B, M, 3) query centers.
      radius: ball radius (static).
      nsample: max neighbors K (static).

    Returns:
      idx: (B, M, K) int32 neighbor indices — the first K in-radius points in
        original order; slots beyond the count repeat the first neighbor;
        all-zero if the ball is empty (matching ball_query_gpu.cu).
      counts: (B, M) int32 number of in-radius points found (capped at K).
    """
    N = xyz.shape[1]
    d = pairwise_sqdist(new_xyz, xyz)  # (B, M, N)
    mask = d < radius * radius  # strict <, per ball_query_gpu.cu:31 (d2 < radius2)
    # Key: in-radius points get 2N - position (positive, decreasing in position);
    # out-of-radius get 0.  top_k then yields the first-K in scan order.
    pos = jnp.arange(N, dtype=jnp.int32)
    key = jnp.where(mask, (2 * N) - pos, 0)
    k_eff = min(nsample, N)  # K may exceed N (e.g. coarsest 16-point level)
    topv, topi = jax.lax.top_k(key, k_eff)  # (B, M, k_eff)
    if k_eff < nsample:
        pad = jnp.broadcast_to(
            topi[..., :1], topi.shape[:-1] + (nsample - k_eff,)
        )
        topi = jnp.concatenate([topi, pad], axis=-1)
    counts = jnp.sum(mask, axis=-1, dtype=jnp.int32)
    counts = jnp.minimum(counts, nsample)
    slot = jnp.arange(nsample, dtype=jnp.int32)
    has_any = counts > 0
    first = topi[..., :1]
    idx = jnp.where(slot < counts[..., None], topi, first)
    idx = jnp.where(has_any[..., None], idx, 0)
    return idx.astype(jnp.int32), counts


def ball_query(xyz, new_xyz, radius, nsample):
    """Ball-query dispatcher: Pallas on TPU (jax.lax.top_k lowers to a full
    sort there — ~45% of a denoiser step profiled), XLA elsewhere.  The
    kernel's row tile adapts to N; beyond the single-row VMEM envelope we
    fall back to XLA rather than Mosaic-error."""
    from .sampling import _use_pallas

    if _use_pallas():
        from .pallas_neighbors import ball_query_pallas, row_tile

        if row_tile(new_xyz.shape[1], xyz.shape[1]) is not None:
            return ball_query_pallas(xyz, new_xyz, radius, nsample)
    return ball_query_xla(xyz, new_xyz, radius, nsample)


@functools.partial(jax.jit, static_argnums=(2,))
def knn_xla(query: jax.Array, points: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """k nearest neighbors by squared distance (ascending), ties by index.

    Args:
      query: (B, M, 3).
      points: (B, N, 3).
      k: number of neighbors (static; callers should pass min(k, N)).

    Returns:
      dists: (B, M, k) squared distances, ascending.
      idx: (B, M, k) int32 indices.
    """
    d = pairwise_sqdist(query, points)  # (B, M, N)
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx.astype(jnp.int32)


def knn(query, points, k):
    """kNN dispatcher: sort-free Pallas kernel on TPU, XLA top_k elsewhere.
    Same VMEM-envelope fallback rule as ball_query."""
    from .sampling import _use_pallas

    if _use_pallas():
        from .pallas_neighbors import knn_pallas, row_tile

        if row_tile(query.shape[1], points.shape[1]) is not None:
            return knn_pallas(query, points, k)
    return knn_xla(query, points, k)


def count_to_mask(counts: jax.Array, k: int) -> jax.Array:
    """(B, M) counts -> (B, M, k) boolean validity mask.

    Mirrors pointnet2_utils.py:36-44.
    """
    slot = jnp.arange(k, dtype=counts.dtype)
    return slot < counts[..., None]


def masked_mean(feature: jax.Array, counts, axis: int = -2) -> jax.Array:
    """Average over the neighbor axis honoring per-center valid counts.

    Mirrors ``average_feature`` (pointnet2_utils.py:46-60): counts are clamped
    to >= 1 and padded slots are zeroed before the sum.  ``counts`` may be the
    string 'all' to mean every slot is valid.

    Args:
      feature: (..., K, C) grouped features, neighbor axis second-to-last.
      counts: (...,) int counts or 'all'.
    """
    k = feature.shape[axis]
    if isinstance(counts, str) and counts == "all":
        return jnp.mean(feature, axis=axis)
    c = jnp.maximum(counts, 1)
    mask = count_to_mask(c, k)[..., None].astype(feature.dtype)  # (..., K, 1)
    s = jnp.sum(feature * mask, axis=axis)
    return s / c[..., None].astype(feature.dtype)
