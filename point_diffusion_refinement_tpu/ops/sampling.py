"""Furthest point sampling and index gathers, XLA-native.

Reference semantics: pointnet2_ops_lib/pointnet2_ops/_ext-src/src/sampling_gpu.cu
(furthest_point_sampling_kernel, lines 69-173) and the autograd wrappers in
pointnet2_ops/pointnet2_utils.py:62-129.  Instead of a CUDA block per batch row
with a shared-memory tree reduction, we carry a running min-distance vector in
registers/VMEM across a `lax.fori_loop`; the per-iteration argmax maps onto the
VPU and the (B, N) distance update is a fused broadcast-subtract-reduce.

Quirks reproduced exactly:
  * the first selected index is always 0;
  * points with squared norm <= 1e-3 are treated as padding and never selected
    (sampling_gpu.cu:100-101) — MVP partial clouds pad with zeros;
  * selection maximizes the running minimum distance to the selected set.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

PAD_NORM_SQ = 1e-3


def _use_pallas() -> bool:
    import os

    if os.environ.get("PDR_DISABLE_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnums=(1,))
def furthest_point_sample_xla(xyz: jax.Array, npoint: int) -> jax.Array:
    """Pure-XLA FPS (fori_loop); used on CPU and as the reference
    implementation for the Pallas kernel's parity tests.

    Args:
      xyz: (B, N, 3) point positions.
      npoint: number of points to select (static).

    Returns:
      (B, npoint) int32 indices into N.  Non-differentiable (indices).
    """
    B, N, _ = xyz.shape
    x = xyz.astype(jnp.float32)
    valid = jnp.sum(x * x, axis=-1) > PAD_NORM_SQ  # (B, N)

    def body(j, carry):
        mindist, old, idxs = carry
        # squared distance of every point to the most recently selected point
        sel = jnp.take_along_axis(x, old[:, None, None], axis=1)  # (B, 1, 3)
        d = jnp.sum(jnp.square(x - sel), axis=-1)  # (B, N)
        mindist = jnp.minimum(mindist, d)
        cand = jnp.where(valid, mindist, -1.0)
        new = jnp.argmax(cand, axis=-1).astype(jnp.int32)  # (B,)
        idxs = jax.lax.dynamic_update_index_in_dim(idxs, new, j, axis=1)
        return mindist, new, idxs

    init_idx = jnp.zeros((B, npoint), dtype=jnp.int32)
    init_old = jnp.zeros((B,), dtype=jnp.int32)
    init_dist = jnp.full((B, N), 1e10, dtype=jnp.float32)
    _, _, idxs = jax.lax.fori_loop(1, npoint, body, (init_dist, init_old, init_idx))
    return idxs


def furthest_point_sample(xyz: jax.Array, npoint: int) -> jax.Array:
    """FPS dispatcher: single-kernel Pallas implementation on TPU (the
    per-iteration launch overhead of the XLA while-loop dominates there),
    pure XLA elsewhere.  The Pallas kernel grid-tiles the batch, so the only
    hard envelope is a single (1, N) row set fitting VMEM — beyond that we
    fall back to XLA instead of risking a Mosaic allocation error."""
    if _use_pallas():
        from .pallas_fps import fps_batch_tile, furthest_point_sample_pallas

        if fps_batch_tile(xyz.shape[0], xyz.shape[1]) >= 1 and xyz.shape[1] <= 2 ** 18:
            return furthest_point_sample_pallas(xyz, npoint)
    return furthest_point_sample_xla(xyz, npoint)


def furthest_point_sample_and_gather(xyz: jax.Array, npoint: int):
    """FPS + gather of the selected positions in one pass.

    On TPU the Pallas kernel emits the selected coordinates directly (it
    extracts them every iteration anyway, pallas_fps._fps_kernel_coords) so
    the follow-up row gather — an XLA kLoop at ~27 us for (4, 2048) — never
    runs; elsewhere falls back to FPS + gather_points.  Returns
    (idx (B, npoint) i32, new_xyz (B, npoint, 3) f32), bit-identical to
    ``idx = furthest_point_sample(xyz, npoint); gather_points(xyz, idx)``.
    """
    if _use_pallas():
        from .pallas_fps import fps_batch_tile, furthest_point_sample_pallas_coords

        if fps_batch_tile(xyz.shape[0], xyz.shape[1]) >= 1 and xyz.shape[1] <= 2 ** 18:
            return furthest_point_sample_pallas_coords(xyz, npoint)
    idx = furthest_point_sample(xyz, npoint)
    return idx, gather_points(xyz, idx)


def gather_rows_mxu(points: jax.Array, idx: jax.Array, lossy: bool = False) -> jax.Array:
    """Row gather (B, N, C) x (B, M) -> (B, M, C) as a one-hot MXU
    contraction (XLA's native row gather is a ~20 GB/s kLoop fusion on TPU).

    lossy=True emits bf16-rounded rows (exact when the rows already are
    bf16, or when the consumer is a bf16-compute Dense that would round its
    input anyway); lossy=False reconstructs ~16 mantissa bits from an hi/lo
    split.  Off-TPU falls back to the exact native gather."""
    if not _use_pallas():
        return gather_points(points, idx)
    oh = jax.nn.one_hot(idx, points.shape[1], dtype=jnp.bfloat16)  # (B, M, N)
    if lossy:
        return jnp.einsum(
            "bmn,bnc->bmc", oh, points.astype(jnp.bfloat16),
            preferred_element_type=jnp.bfloat16,
        )
    hi = points.astype(jnp.bfloat16)
    lo = (points.astype(jnp.float32) - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jnp.einsum(
        "bmn,bnc->bmc", oh, jnp.concatenate([hi, lo], axis=-1),
        preferred_element_type=jnp.float32,
    )
    C = points.shape[-1]
    return out[..., :C] + out[..., C:]


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather points/features by index along the point axis.

    Channels-last analogue of the reference ``gather_operation``
    (pointnet2_utils.py:96-129 operates on (B, C, N); we use (B, N, C)).
    Advanced indexing with an explicit batch iota lowers to a batched XLA
    gather, ~4x faster on TPU than take_along_axis's kLoop fusion.

    Args:
      points: (B, N, C).
      idx: (B, M) int indices.

    Returns:
      (B, M, C).  Differentiable w.r.t. ``points`` (scatter-add VJP).
    """
    B = points.shape[0]
    return points[jnp.arange(B)[:, None], idx, :]


def _group_points_onehot(points: jax.Array, idx: jax.Array, lossy: bool = False) -> jax.Array:
    """TPU grouping as a one-hot matmul on the MXU.

    XLA lowers multi-index gathers to scalar kLoop fusions on TPU
    (~14 GB/s measured); contracting a fused one-hot against the point table
    runs ~19x faster.  The 4D einsum emits the (B, M, K, C) result directly
    (the 2D form + reshape costs an extra relayout pass).  XLA fuses the
    one-hot into the contraction — the (B, M, K, N) factor never
    materializes.  The f32 rows are split hi/lo into two bfloat16 matmuls so
    the reconstruction keeps ~16 mantissa bits (the one-hot factor is exact
    in bf16).  The VJP is the transposed matmul — an MXU-friendly
    scatter-add.
    """
    N = points.shape[1]
    oh = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)  # (B, M, K, N), fused
    hi = points.astype(jnp.bfloat16)
    if lossy:
        # rows feed bf16 compute anyway: one matmul, bf16-rounded values.
        # bf16 OUTPUT dtype: a one-hot contraction has a single nonzero
        # product per output element, so the bf16 result is bit-identical
        # to rounding the f32 result — and XLA then never materializes an
        # f32 copy of the (B, M, K, C) tensor (measured 43 MB/step of extra
        # HBM traffic at the FP-0 shapes).  The MXU still accumulates in
        # f32 internally; the VJP's transposed contraction rounds its final
        # per-row sum to bf16 once (grads flow onward through the caller's
        # f32 upcast).
        return jnp.einsum(
            "bmkn,bnc->bmkc", oh, hi, preferred_element_type=jnp.bfloat16
        )
    out = jnp.einsum("bmkn,bnc->bmkc", oh, hi, preferred_element_type=jnp.float32)
    lo = (points - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return out + jnp.einsum(
        "bmkn,bnc->bmkc", oh, lo, preferred_element_type=jnp.float32
    )


def _gather_ta() -> bool:
    """Experimental (PDR_GATHER_TA=1): row gathers via take_along_axis instead
    of the one-hot MXU contraction.  The one-hot form was picked in round 1
    ("take_along lowers to a ~14 GB/s kLoop"); re-measuring in round 3 with
    the current fusion layouts to see whether native gathers now win at the
    kNN-FP shapes (K=8, wide C) where the one-hot contraction is MXU-bound."""
    import os

    return os.environ.get("PDR_GATHER_TA", "0") == "1"


def group_points_with_xyz(
    xyz: jax.Array,
    features: jax.Array | None,
    idx: jax.Array,
    lossy_features: bool = False,
):
    """Gather neighbor positions AND features with ONE one-hot contraction.

    Equivalent to ``(group_points(xyz, idx), group_points(features, idx,
    lossy_features))`` but packs both tables into a single (B, N, 3[+3]+C)
    einsum operand: every one-hot MXU contraction pays for 128 output lanes
    regardless of width, so gathering the 3-wide positions separately from
    the C-wide features costs two full matmul passes where one suffices
    (profiled ~0.2 ms each at (4, 1024, 32) x 2048 on v5e).  Positions are
    reconstructed from hi/lo bfloat16 halves (~16 mantissa bits) exactly as
    ``group_points(lossy=False)`` does.

    Returns:
      (abs_xyz (B, M, K, 3) f32, grouped_features (B, M, K, C) or None).
    """
    if not _use_pallas():
        g_xyz = group_points(xyz, idx)
        g_feat = (
            group_points(features, idx, lossy=lossy_features)
            if features is not None
            else None
        )
        return g_xyz, g_feat
    if _gather_ta():
        B, M, K = idx.shape
        flat = idx.reshape(B, M * K)[..., None]
        g_xyz = jnp.take_along_axis(xyz.astype(jnp.float32), flat, axis=1)
        g_xyz = g_xyz.reshape(B, M, K, 3)
        if features is None:
            return g_xyz, None
        f = features.astype(jnp.bfloat16) if lossy_features else features
        g_feat = jnp.take_along_axis(f, flat, axis=1).reshape(
            B, M, K, features.shape[-1]
        )
        return g_xyz, g_feat
    N = xyz.shape[1]
    oh = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)  # fused, never materialized
    xhi = xyz.astype(jnp.bfloat16)
    xlo = (xyz.astype(jnp.float32) - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
    if features is None:
        out = jnp.einsum(
            "bmkn,bnc->bmkc", oh, jnp.concatenate([xhi, xlo], axis=-1),
            preferred_element_type=jnp.float32,
        )
        return out[..., 0:3] + out[..., 3:6], None
    if lossy_features:
        table = jnp.concatenate(
            [xhi, xlo, features.astype(jnp.bfloat16)], axis=-1
        )
        # bf16 output: exact for a one-hot contraction (single product per
        # element), and it stops XLA from materializing an f32 copy of the
        # whole (B, M, K, 6+C) tensor next to the bf16 one.  Positions
        # reconstruct in f32 from the exactly-gathered hi/lo halves.
        out = jnp.einsum(
            "bmkn,bnc->bmkc", oh, table, preferred_element_type=jnp.bfloat16
        )
        abs_xyz = out[..., 0:3].astype(jnp.float32) + out[..., 3:6].astype(
            jnp.float32
        )
        return abs_xyz, out[..., 6:]
    fhi = features.astype(jnp.bfloat16)
    flo = (features.astype(jnp.float32) - fhi.astype(jnp.float32)).astype(
        jnp.bfloat16
    )
    hi_t = jnp.concatenate([xhi, fhi], axis=-1)
    lo_t = jnp.concatenate([xlo, flo], axis=-1)
    out = jnp.einsum(
        "bmkn,bnc->bmkc", oh, hi_t, preferred_element_type=jnp.float32
    ) + jnp.einsum(
        "bmkn,bnc->bmkc", oh, lo_t, preferred_element_type=jnp.float32
    )
    return out[..., 0:3], out[..., 3:]


def group_points(points: jax.Array, idx: jax.Array, lossy: bool = False) -> jax.Array:
    """Gather neighbor groups: (B, N, C) x (B, M, K) -> (B, M, K, C).

    Channels-last analogue of ``grouping_operation``
    (pointnet2_utils.py:222-268).  One-hot MXU matmul on TPU; exact
    take_along_axis elsewhere.  `lossy=True` permits bf16-rounded values
    (used for feature gathers in bf16-compute models; positions always stay
    high-precision).
    """
    B, M, K = idx.shape
    if _use_pallas() and not _gather_ta():
        return _group_points_onehot(points, idx, lossy=lossy)
    flat = idx.reshape(B, M * K)
    p = points.astype(jnp.bfloat16) if (lossy and _use_pallas()) else points
    out = jnp.take_along_axis(p, flat[..., None], axis=1)
    return out.reshape(B, M, K, points.shape[-1])
