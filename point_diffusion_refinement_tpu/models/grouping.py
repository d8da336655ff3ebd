"""Grouping feature assembly: QueryAndGroup and group_knn, channels-last.

Reference: pointnet2_ops/pointnet2_utils.py:307-514.  These are pure
functions (no parameters) so they live outside Flax modules; static shapes
throughout — variable neighbor counts are carried as a (B, M) count tensor
plus repeat-first / zero-feature padding, exactly as the CUDA path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from ..ops.neighbors import ball_query, knn
from ..ops.sampling import group_points_with_xyz

Counts = Union[jax.Array, str]  # (B, M) int32, or 'all' for kNN groups


class Grouped(NamedTuple):
    features: jax.Array  # (B, M, K, C_total)
    counts: Counts


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_ball_gather(xyz, new_xyz, table, radius, nsample):
    """ball_query + gather-table-rows as ONE Pallas kernel (TPU hot path).

    Equivalent to `idx, counts = ball_query(...); g = group_points(table,
    idx)` but the gather runs as MXU matmuls against the in-VMEM table
    instead of XLA's per-channel kLoop one-hot fusions
    (ops/pallas_neighbors.py:ball_query_group_pallas).  Differentiable in
    `table` (transposed one-hot scatter, bf16-rounded cotangents like the
    bf16 compute path); the neighbor selection is non-differentiable, like
    the reference's GroupingOperation (pointnet2_utils.py:222-268).
    """
    from ..ops.pallas_neighbors import ball_query_group_pallas

    return ball_query_group_pallas(xyz, new_xyz, table, radius, nsample)


def _fused_ball_gather_fwd(xyz, new_xyz, table, radius, nsample):
    out = _fused_ball_gather(xyz, new_xyz, table, radius, nsample)
    g, idx, counts = out
    return out, (idx, table.shape)


def _fused_ball_gather_bwd(radius, nsample, res, cot):
    idx, table_shape = res
    dg = cot[0]
    N = table_shape[1]
    oh = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)  # (B, M, K, N), fused
    dtable = jnp.einsum(
        "bmkn,bmkc->bnc", oh, dg.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return None, None, dtable


_fused_ball_gather.defvjp(_fused_ball_gather_fwd, _fused_ball_gather_bwd)


def _use_fused_ball_gather(M: int, N: int, C: int, nsample: int) -> bool:
    """Opt-in (PDR_FUSED_GATHER=1): measured on v5e, the fused kernel's MXU
    one-hot matmuls (~N MACs per gathered element) cost about the same as
    XLA's kLoop one-hot fusions at the shipped shapes, and lose the
    cross-module CSE of the shared ball query — end-to-end it was 13.5 vs
    9.6 ms/step at B=4.  Kept for the windowed variant (reduced N per
    query), where the matmul cost shrinks with the window."""
    import os

    from ..ops.pallas_neighbors import fused_row_tile
    from ..ops.sampling import _use_pallas

    if not os.environ.get("PDR_FUSED_GATHER"):
        return False
    return _use_pallas() and fused_row_tile(M, N, C, nsample) is not None


def query_and_group(
    xyz: jax.Array,
    new_xyz: jax.Array,
    features: Optional[jax.Array],
    *,
    radius: float,
    nsample: int,
    neighbor_def: str = "radius",
    use_xyz: bool = True,
    include_abs_coordinate: bool = False,
    include_center_coordinate: bool = False,
    subset: bool = True,
    lossy_features: bool = False,
) -> Grouped:
    """Ball-query or kNN grouping with positional channels.

    Output channel order matches QueryAndGroup.forward
    (pointnet2_utils.py:332-438): [features, relative_xyz, abs_xyz?,
    center_xyz?].  With subset=False and radius neighbors, centers with empty
    balls substitute themselves as the single neighbor with zero features
    (pointnet2_utils.py:376-410).

    Args:
      xyz: (B, N, 3) support points; new_xyz: (B, M, 3) centers;
      features: (B, N, C) or None.
    """
    fused = neighbor_def == "radius" and _use_fused_ball_gather(
        new_xyz.shape[1], xyz.shape[1],
        3 + (features.shape[-1] if features is not None else 0), nsample,
    )
    if fused:
        # query + gather in one Pallas kernel; table = [xyz, features]
        table = (
            jnp.concatenate([xyz, features.astype(jnp.float32)], axis=-1)
            if features is not None
            else xyz
        )
        gathered, idx, counts_arr = _fused_ball_gather(
            xyz, new_xyz, table, radius, nsample
        )
        counts = counts_arr
        abs_xyz = gathered[..., :3]
        fused_features = gathered[..., 3:] if features is not None else None
    elif neighbor_def == "radius":
        idx, counts_arr = ball_query(xyz, new_xyz, radius, nsample)
        counts = counts_arr
    elif neighbor_def == "nn":
        k = min(nsample, xyz.shape[1])
        _, idx = knn(new_xyz, xyz, k)
        counts = "all"
    else:
        raise ValueError(f"Neighbor definition {neighbor_def} is not supported")

    if not fused:
        # positions + features in ONE one-hot contraction (each MXU gather
        # pass pays for 128 lanes regardless of width)
        abs_xyz, packed_features = group_points_with_xyz(
            xyz, features, idx, lossy_features=lossy_features
        )
    center = new_xyz[:, :, None, :]  # (B, M, 1, 3)
    if (not subset) and neighbor_def == "radius":
        have = (counts_arr > 0).astype(abs_xyz.dtype)[..., None, None]  # (B,M,1,1)
        abs_xyz = have * abs_xyz + (1.0 - have) * center
        relative = abs_xyz - center
    else:
        relative = abs_xyz - center

    parts = []
    grouped_xyz = relative
    if include_abs_coordinate:
        grouped_xyz = jnp.concatenate([relative, abs_xyz], axis=-1)
    if include_center_coordinate:
        c = jnp.broadcast_to(center, abs_xyz.shape)
        grouped_xyz = jnp.concatenate([grouped_xyz, c], axis=-1)

    if features is not None:
        grouped_features = fused_features if fused else packed_features
        if not subset and neighbor_def == "radius":
            grouped_features = have * grouped_features  # zero-feature default
        if use_xyz:
            parts = [grouped_features, grouped_xyz]
        else:
            parts = [grouped_features]
    else:
        assert use_xyz, "Cannot have no features and not use xyz as a feature!"
        parts = [grouped_xyz]

    return Grouped(jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0], counts)


def group_all(
    xyz: jax.Array, features: Optional[jax.Array], use_xyz: bool = True
) -> Grouped:
    """Group every point into one group — GroupAll
    (pointnet2_utils.py:441-484): output (B, 1, N, C [+3])."""
    grouped_xyz = xyz[:, None, :, :]  # (B, 1, N, 3)
    if features is not None:
        grouped = features[:, None, :, :]
        if use_xyz:
            grouped = jnp.concatenate([grouped, grouped_xyz], axis=-1)
    else:
        grouped = grouped_xyz
    return Grouped(grouped, "all")


def group_knn_features(
    x: jax.Array, y: jax.Array, features_at_y: jax.Array, k: int,
    lossy_features: bool = False,
) -> jax.Array:
    """kNN gather producing the (C+11)-channel features of group_knn
    (pointnet2_utils.py:487-514).

    Channel order: [neighbor_feats (C), squared_dist (1), inv-dist weight (1),
    abs neighbor pos (3), relative pos (3), query pos (3)].

    Args:
      x: (B, N1, 3) queries; y: (B, N2, 3) support; features_at_y: (B, N2, C).

    Returns:
      (B, N1, K, C+11).
    """
    dist, idx = knn(x, y, k)  # squared distances, like pytorch3d knn_points
    nn_abs, neigh_feats = group_points_with_xyz(
        y, features_at_y, idx, lossy_features=lossy_features
    )  # (B, N1, K, 3), (B, N1, K, C) — one fused one-hot contraction
    x_rep = jnp.broadcast_to(x[:, :, None, :], nn_abs.shape)
    nn_rel = nn_abs - x_rep
    d = dist[..., None]  # (B, N1, K, 1)
    recip = 1.0 / (d + 1e-8)
    weight = recip / jnp.sum(recip, axis=-2, keepdims=True)
    parts = [neigh_feats, d, weight, nn_abs, nn_rel, x_rep]
    if lossy_features:
        # the consumer MLP promotes to bf16 anyway (dtype=bfloat16 Dense) —
        # emitting the concat in bf16 halves the bytes of the widest FP
        # tensor with values identical after the Dense's own cast
        parts = [p.astype(jnp.bfloat16) for p in parts]
    return jnp.concatenate(parts, axis=-1)
