"""Chamfer distance, F-score, and the cd_p/cd_t losses, XLA-native.

Reference: pointnet2/chamfer_loss_new.py (pytorch3d-kNN based; `calc_cd` at
lines 234-245, `fscore` at 219-232) and the brute-force CUDA kernels in
pointnet2/models/pvd/metrics/ChamferDistancePytorch/chamfer3D/.

TPU design: the nearest-neighbor search is one batched matmul distance matrix
(MXU) reduced with argmin.  For large clouds the row axis is processed in
static chunks under `lax.scan` so the (chunk x N) tile stays in VMEM-friendly
sizes.  Gradients flow through a differentiable re-gather of the argmin
neighbor (exactly pytorch3d's backward), not through the full distance matrix,
so the backward pass is O(N) not O(N^2) memory.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .neighbors import pairwise_sqdist

# Max elements per (B * chunk * N) distance tile before we switch to chunking.
_TILE_BUDGET = 1 << 26  # 64M f32 elements = 256 MB


def _argmin_chunked(a: jax.Array, b: jax.Array, chunk: int) -> jax.Array:
    """argmin_j ||a_i - b_j||^2 for each row i, scanning row-chunks of a."""
    B, M, _ = a.shape
    pad = (-M) % chunk
    if pad:
        # pad with the first row; results for padded rows are discarded
        a = jnp.concatenate([a, jnp.broadcast_to(a[:, :1], (B, pad, 3))], axis=1)
    n_chunks = a.shape[1] // chunk
    a_chunks = a.reshape(B, n_chunks, chunk, 3).transpose(1, 0, 2, 3)

    def body(_, ac):
        d = pairwise_sqdist(ac, b)  # (B, chunk, N)
        return None, jnp.argmin(d, axis=-1).astype(jnp.int32)

    _, idx = jax.lax.scan(body, None, a_chunks)
    idx = idx.transpose(1, 0, 2).reshape(B, n_chunks * chunk)
    return idx[:, :M]


def nn_sqdist(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-point squared distance to the nearest neighbor in the other cloud.

    Args:
      a: (B, M, 3); b: (B, N, 3).

    Returns:
      (dist, idx): (B, M) squared distances (differentiable w.r.t. both
      clouds) and (B, M) int32 neighbor indices.
    """
    B, M, _ = a.shape
    N = b.shape[1]
    if B * M * N <= _TILE_BUDGET:
        idx = jnp.argmin(
            jax.lax.stop_gradient(pairwise_sqdist(a, b)), axis=-1
        ).astype(jnp.int32)
    else:
        chunk = max(128, _TILE_BUDGET // max(B * N, 1))
        chunk = min(chunk, M)
        idx = _argmin_chunked(jax.lax.stop_gradient(a), jax.lax.stop_gradient(b), chunk)
    nearest = b[jnp.arange(B)[:, None], idx, :]  # (B, M, 3) batched gather
    dist = jnp.sum(jnp.square(a - nearest), axis=-1)
    return dist, idx


def chamfer_distance(x: jax.Array, y: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Unreduced bidirectional squared chamfer terms.

    Matches chamfer_loss_new.py:237 with batch_reduction=None,
    point_reduction=None: returns (dist1, dist2) = per-point squared NN
    distances of x-in-y and y-in-x, shapes (B, P1) and (B, P2).
    """
    d1, _ = nn_sqdist(x, y)
    d2, _ = nn_sqdist(y, x)
    return d1, d2


def fscore(dist1: jax.Array, dist2: jax.Array, threshold: float = 1e-4):
    """F-score at a squared-distance threshold (chamfer_loss_new.py:219-232).

    NaN (both precisions zero) maps to 0.
    """
    p1 = jnp.mean((dist1 < threshold).astype(jnp.float32), axis=1)
    p2 = jnp.mean((dist2 < threshold).astype(jnp.float32), axis=1)
    denom = p1 + p2
    f = jnp.where(denom > 0, 2.0 * p1 * p2 / jnp.where(denom > 0, denom, 1.0), 0.0)
    return f, p1, p2


@functools.partial(jax.jit, static_argnums=(2,))
def calc_cd(
    output: jax.Array,
    gt: jax.Array,
    calc_f1: bool = False,
    f1_threshold: float = 1e-4,
):
    """Per-sample (cd_p, cd_t[, f1]) exactly as chamfer_loss_new.py:234-245.

    Note the reference calls chamfer_distance(gt, output), so dist1 is
    gt->output and dist2 is output->gt; cd_p averages the sqrt distances and
    halves, cd_t sums the mean squared distances.
    """
    dist1, dist2 = chamfer_distance(gt, output)
    cd_p = (jnp.sqrt(dist1).mean(axis=1) + jnp.sqrt(dist2).mean(axis=1)) / 2.0
    cd_t = dist1.mean(axis=1) + dist2.mean(axis=1)
    if calc_f1:
        f1, _, _ = fscore(dist1, dist2, threshold=f1_threshold)
        return cd_p, cd_t, f1
    return cd_p, cd_t
