"""Differentiable wrapper for the windowed fused ball grouping (training).

The windowed kernel (ops/pallas_window.py) is forward-only; this wrapper
gives the build-ctx + kernel pipeline a custom VJP so the TRAIN step can run
the fused grouping too.  Backward semantics mirror the reference:

  * neighbor-feature grads scatter-add into the support rows by original
    index (group_points_gpu.cu:43-64), padded slots routing to the repeated
    first neighbor because idx already encodes the repeat;
  * position channels are differentiable through the gather
    (QueryAndGroup builds grouped_xyz with index ops): d xyz[idx] gets
    d(abs) + d(rel), the query point gets -sum_k d(rel) (+ sum_k d(center));
  * empty balls: with empty_mode='center_zero' (QueryAndGroup subset=False)
    the substituted center routes d(abs) to the query and the zeroed
    features get no grad; with 'row0' all slots gather support row 0, so
    the plain scatter is already correct;
  * the sort keys / window selection are treated as non-differentiable,
    like the reference's ball-query indices.

The scatter is the transposed one-hot MXU contraction (bf16 one-hot, f32
accumulation) — cotangents are bf16-rounded exactly like the lossy forward
gathers.  Grad parity vs the unfused query_and_group path is tested in
tests/test_windowed_grad.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .pallas_window import (
    build_query_ctx,
    build_support_ctx,
    windowed_ball_group,
)


class _LightQueryOrder(NamedTuple):
    order: jax.Array      # (B, M) sorted -> original
    inv_order: jax.Array  # (B, M) original -> sorted


def _forward(xyz, features, new_xyz, radius, nsample, include_center,
             empty_mode, interpret):
    sup = build_support_ctx(xyz, [features])
    assert sup is not None, "caller must check eligibility (table width)"
    q = build_query_ctx(new_xyz, sup.axis_onehot)
    wg = windowed_ball_group(
        sup, q, radius, nsample,
        include_center=include_center, empty_mode=empty_mode,
        interpret=interpret,
    )
    return wg.grouped[0], wg.counts, wg.idx, q.order, q.inv_order


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def windowed_group_train(xyz, features, new_xyz, radius, nsample,
                         include_center=False, empty_mode="row0",
                         interpret=False):
    """Differentiable windowed fused ball grouping.

    Args:
      xyz: (B, N, 3) support positions; features: (B, N, C) support features;
      new_xyz: (B, M, 3) query centers (M % 128 == 0 recommended).

    Returns:
      grouped: (B, M, K, C + 6|9) bf16 in SORTED-QUERY order
        ([feats, rel, abs(, center)] like query_and_group);
      counts: (B, M) i32 sorted-query order;
      idx: (B, M, K) i32 original support indices;
      order / inv_order: (B, M) i32 query sort permutations — run per-center
        work in sorted order and gather the pooled result by `inv_order`.
    """
    return _forward(xyz, features, new_xyz, radius, nsample, include_center,
                    empty_mode, interpret)


def _fwd(xyz, features, new_xyz, radius, nsample, include_center, empty_mode,
         interpret):
    out = _forward(xyz, features, new_xyz, radius, nsample, include_center,
                   empty_mode, interpret)
    grouped, counts, idx, order, inv_order = out
    res = (idx, counts, inv_order, xyz.shape, features.shape)
    return out, res


def _bwd(radius, nsample, include_center, empty_mode, interpret, res, cot):
    idx, counts, inv_order, xyz_shape, feat_shape = res
    d_grouped = cot[0]
    B, N, _ = xyz_shape
    C = feat_shape[-1]

    d_feats = d_grouped[..., :C]
    d_rel = d_grouped[..., C:C + 3]
    d_abs = d_grouped[..., C + 3:C + 6]
    d_center = d_grouped[..., C + 6:C + 9] if include_center else None

    d_pos = (d_rel + d_abs).astype(jnp.float32)  # abs feeds both channels
    if empty_mode == "center_zero":
        have = (counts > 0).astype(jnp.float32)[..., None, None]  # (B,M,1,1)
        d_feats = d_feats * have
        d_pos_support = d_pos * have
        # empty balls: abs == center (the query point); rel == 0 identically
        d_q_empty = jnp.sum(d_abs.astype(jnp.float32) * (1.0 - have), axis=2)
    else:  # 'row0': every slot gathers a real support row (row 0 if empty)
        d_pos_support = d_pos
        d_q_empty = 0.0

    oh = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)  # (B, M, K, N) — fused
    d_features = jnp.einsum(
        "bmkn,bmkc->bnc", oh, d_feats.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32)
    d_xyz = jnp.einsum(
        "bmkn,bmkc->bnc", oh, d_pos_support.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    d_new_sorted = -jnp.sum(d_rel.astype(jnp.float32), axis=2) + d_q_empty
    if empty_mode == "center_zero":
        # for have rows rel grads flow as usual; empty rows' rel is exactly 0
        # (center - center) so d_rel contributes dq - dq = 0 there: mask them
        d_new_sorted = (
            -jnp.sum(d_rel.astype(jnp.float32) * have, axis=2) + d_q_empty
        )
    if d_center is not None:
        d_new_sorted = d_new_sorted + jnp.sum(
            d_center.astype(jnp.float32), axis=2
        )
    # sorted-query rows -> original rows: row r was sorted position
    # inv_order[r]
    d_new = jnp.take_along_axis(d_new_sorted, inv_order[..., None], axis=1)
    return d_xyz, d_features, d_new


windowed_group_train.defvjp(_fwd, _bwd)
