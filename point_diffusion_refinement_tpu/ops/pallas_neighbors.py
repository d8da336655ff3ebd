"""Ball query and kNN as Pallas TPU kernels.

Motivation (profiled on v5e): `jax.lax.top_k` lowers to a full variadic SORT
on TPU — the 13 ball queries + 4 kNN groupings per denoiser forward spend
~45% of the step in sorts.  Neither op needs a sort:

  * ball query ("first <= K in-radius points in index order") uses the
    closed form  idx(m, k) = sum_n [ cumsum_incl(m, n) <= k ]  — the number
    of positions before the (k+1)-th in-radius point IS its index.  One
    in-VMEM cumulative sum (log-shift scan) + K masked reductions, no
    ordering anywhere.
  * kNN (small K) extracts minima iteratively: K rounds of (min, index-min,
    mask-out) on the distance tile held in VMEM — ties resolve to the lowest
    index exactly like a stable sort.

Both kernels tile the centers/queries over a grid of (batch, row-tiles) with
the (rows, N) distance tile resident in VMEM; distances are computed by
per-coordinate broadcast subtraction (exact — see ops/neighbors.py note).

Reference semantics: ball_query_gpu.cu:9-47 and pytorch3d knn_points as used
in pointnet2_utils.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# Per-grid-step VMEM budget for the (rows, N) working set: ~4 live
# (rows, N) 4-byte planes (distance, mask/cumsum, shifted temp, iota).
# Empirical envelope on v5e: 256x3072 compiles (~13 MB under this model),
# 128x16384 does not (~34 MB) — beyond the budget the dispatcher falls back
# to XLA instead of hitting a Mosaic compile error.
_NBR_VMEM_BUDGET = 14 * 2 ** 20
_NBR_PLANES = 4


def row_tile(M: int, N: int):
    """Row-tile size whose (rows, Np) working set fits the VMEM budget, or
    None when no legal tile fits (callers fall back to the XLA path).

    Mosaic requires a multi-tile block's last dim (the center/query rows,
    transposed to lanes) to be 128-divisible, so multi-tile sizes are 256 or
    128; a single padded tile (block == whole array) may be any multiple
    of 8."""
    Np = _round_up(N, 128)
    cap = _NBR_VMEM_BUDGET // (Np * 4 * _NBR_PLANES)
    if M > 128:
        for t in (256, 128):
            if cap >= t:
                return t
        return None
    t = _round_up(M, 8)
    return t if t <= cap else None


def _cumsum_lanes(x: jax.Array) -> jax.Array:
    """Inclusive cumulative sum along the lane (last) axis via log-shift
    adds (Mosaic has no native scan)."""
    n = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    s = 1
    while s < n:
        shifted = pltpu.roll(x, s, axis=len(x.shape) - 1)
        x = x + jnp.where(lane >= s, shifted, 0)
        s *= 2
    return x


def _sqdist_tile(cen_ref, xyz_ref):
    """(3, Mt) centers x (3, N) points -> (Mt, N) exact squared distances."""
    d = None
    for c in range(3):
        diff = cen_ref[c, :][:, None] - xyz_ref[c, :][None, :]
        d = diff * diff if d is None else d + diff * diff
    return d


def _ball_query_kernel(radius: float, nsample: int, n_valid: int,
                       xyz_ref, cen_ref, idx_ref, cnt_ref):
    # xyz_ref: (1, 3, N); cen_ref: (1, 3, Mt); idx_ref: (1, Mt, K);
    # cnt_ref: (1, Mt, 8) — counts replicated over an 8-wide minor axis to
    # satisfy Mosaic's block-tiling rules; callers slice [..., 0]
    N = xyz_ref.shape[-1]
    Mt = cen_ref.shape[-1]
    d = _sqdist_tile(cen_ref[0], xyz_ref[0])  # (Mt, N)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Mt, N), 1)
    mask = (d < radius * radius) & (lane < n_valid)
    counts = jnp.sum(mask.astype(jnp.int32), axis=1)  # (Mt,)
    c_incl = _cumsum_lanes(mask.astype(jnp.int32))  # (Mt, N)

    counts_c = jnp.minimum(counts, nsample)
    cnt_ref[0, :, :] = jnp.broadcast_to(counts_c[:, None], (Mt, 8))

    # first in-radius index (for padding); N if the ball is empty
    first = jnp.min(jnp.where(mask, lane, N), axis=1)  # (Mt,)
    pad = jnp.where(first < N, first, 0).astype(jnp.int32)
    cols = []
    for k in range(nsample):
        raw = jnp.sum((c_incl <= k).astype(jnp.int32), axis=1)  # (Mt,)
        cols.append(jnp.where(k < counts_c, raw, pad).astype(jnp.int32))
    idx_ref[0, :, :] = jnp.stack(cols, axis=1)  # (Mt, K)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def ball_query_pallas(
    xyz: jax.Array, new_xyz: jax.Array, radius: float, nsample: int,
    interpret: bool = False,
):
    """Drop-in replacement for ops.neighbors.ball_query on TPU.

    Args:
      xyz: (B, N, 3); new_xyz: (B, M, 3).

    Returns:
      idx (B, M, nsample) int32, counts (B, M) int32.
    """
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    M_TILE = row_tile(M, N)
    assert M_TILE is not None, (M, N)  # dispatcher guards the envelope
    Mp = _round_up(M, M_TILE)
    Np = _round_up(N, 128)

    planes = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    # pad points far away so they are never in-radius; mask guards anyway
    if Np != N:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, Np - N)),
                         constant_values=1e9)
    cen = jnp.transpose(new_xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, M)
    if Mp != M:
        cen = jnp.pad(cen, ((0, 0), (0, 0), (0, Mp - M)), constant_values=1e9)

    kernel = functools.partial(_ball_query_kernel, float(radius), nsample, N)
    grid = (B, Mp // M_TILE)
    idx, cnt = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, Np), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, M_TILE), lambda b, m: (b, 0, m),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, M_TILE, nsample), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M_TILE, 8), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Mp, nsample), jnp.int32),
            jax.ShapeDtypeStruct((B, Mp, 8), jnp.int32),
        ],
        interpret=interpret,
    )(planes, cen)
    return idx[:, :M], cnt[:, :M, 0]


def _knn_kernel(k: int, n_valid: int, q_ref, p_ref, dist_ref, idx_ref):
    # q_ref: (1, 3, Qt); p_ref: (1, 3, N); dist/idx: (1, Qt, k)
    N = p_ref.shape[-1]
    Qt = q_ref.shape[-1]
    d = _sqdist_tile(q_ref[0], p_ref[0])  # (Qt, N)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Qt, N), 1)
    big = jnp.float32(3.4e38)
    d = jnp.where(lane < n_valid, d, big)
    remaining = jnp.ones((Qt, N), jnp.bool_)
    dcols, icols = [], []
    for j in range(k):
        cand = jnp.where(remaining, d, big)
        val = jnp.min(cand, axis=1)  # (Qt,)
        hit = cand == val[:, None]
        sel = jnp.min(jnp.where(hit, lane, N), axis=1)  # lowest index wins
        dcols.append(val)
        icols.append(sel.astype(jnp.int32))
        remaining = remaining & (lane != sel[:, None])
    dist_ref[0, :, :] = jnp.stack(dcols, axis=1)
    idx_ref[0, :, :] = jnp.stack(icols, axis=1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def knn_pallas(query: jax.Array, points: jax.Array, k: int,
               interpret: bool = False):
    """Drop-in replacement for ops.neighbors.knn on TPU (exact, stable-tie).

    Returns (dists (B, M, k) ascending, idx (B, M, k) int32).
    """
    B, M, _ = query.shape
    N = points.shape[1]
    Q_TILE = row_tile(M, N)
    assert Q_TILE is not None, (M, N)  # dispatcher guards the envelope
    Mp = _round_up(M, Q_TILE)
    Np = _round_up(N, 128)

    q = jnp.transpose(query.astype(jnp.float32), (0, 2, 1))
    if Mp != M:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Mp - M)))
    p = jnp.transpose(points.astype(jnp.float32), (0, 2, 1))
    if Np != N:
        p = jnp.pad(p, ((0, 0), (0, 0), (0, Np - N)), constant_values=1e9)

    kernel = functools.partial(_knn_kernel, k, N)
    grid = (B, Mp // Q_TILE)
    dist, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, Q_TILE), lambda b, m: (b, 0, m),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Np), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Q_TILE, k), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q_TILE, k), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Mp, k), jnp.float32),
            jax.ShapeDtypeStruct((B, Mp, k), jnp.int32),
        ],
        interpret=interpret,
    )(q, p)
    return dist[:, :M], idx[:, :M]


# ---------------------------------------------------------------------------
# Fused ball query + neighbor gather
# ---------------------------------------------------------------------------
#
# Profiling (v5e, shipped MVP config): the one-hot MXU gathers that follow a
# ball query are lowered by XLA as kLoop fusions whose cost scales with
# B*M*K*N*C on the VPU — at the 2048-center x 3072-point feature-transfer
# query they cost more than the ball query itself.  Fusing the gather into
# the ball-query kernel turns it into K true MXU matmuls against the
# (N, C) table already resident in VMEM: the k-th neighbor's one-hot is
# (cumsum == k+1) & mask — a byproduct of the closed-form index computation —
# and padding slots (k >= count) reuse the first neighbor's one-hot (empty
# balls row 0), exactly matching gather-of-ball_query-idx semantics.
# Precision: the f32 table is split hi/lo into two bfloat16 factors (one-hot
# rows are exact in bf16), reconstructing ~16 mantissa bits — identical to
# the standalone one-hot MXU gather this replaces (ops/sampling.py
# _group_points_onehot).  The neighbor INDEX rides along as one extra hi/lo
# column (integers < 2^16 reconstruct exactly), so no separate index pass is
# needed.

_FUSED_LANE_COL = True  # the appended index column


def fused_row_tile(M: int, N: int, C: int, nsample: int):
    """Row tile for the fused kernel, or None when it cannot fit VMEM.

    Working set: ~4 (rows, Np) i32/f32 planes (distance/cumsum/temp/iota)
    + 1 bf16 selection plane + hi/lo tables 2*(Np, Cp) bf16 + the
    (rows, K, Cp) f32 output tile.
    """
    Np = _round_up(N, 128)
    Cp = _round_up(C + 1, 128)  # + the lane column
    fixed = 2 * Np * Cp * 2  # hi/lo tables
    if fixed > _NBR_VMEM_BUDGET // 2:
        return None

    def fits(rows):
        per_rows = rows * Np * 4 * 4 + rows * Np * 2 + rows * nsample * Cp * 4
        return fixed + per_rows <= _NBR_VMEM_BUDGET

    if M > 128:
        for t in (256, 128):
            if fits(t):
                return t
        return None
    t = _round_up(M, 8)
    return t if fits(t) else None


def _ball_query_group_kernel(radius: float, nsample: int, n_valid: int,
                             xyz_ref, cen_ref, thi_ref, tlo_ref,
                             feat_ref, cnt_ref):
    # xyz_ref: (1, 3, Np); cen_ref: (1, 3, Mt); thi/tlo: (1, Np, Cp) bf16;
    # feat_ref: (1, Mt, K*Cp) f32 — flat (k-major on lanes): each dot's
    # (Mt, Cp) result keeps rows on sublanes, so the concat is a cheap
    # lane-offset placement; a (Mt, K, Cp) block would relayout every
    # element (rows move off sublanes), measured ~100x slower;
    # cnt_ref: (1, Mt, 8) i32
    N = xyz_ref.shape[-1]
    Mt = cen_ref.shape[-1]
    d = _sqdist_tile(cen_ref[0], xyz_ref[0])  # (Mt, N)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Mt, N), 1)
    mask = (d < radius * radius) & (lane < n_valid)
    counts = jnp.sum(mask.astype(jnp.int32), axis=1)  # (Mt,)
    c_incl = _cumsum_lanes(mask.astype(jnp.int32))  # (Mt, N)

    counts_c = jnp.minimum(counts, nsample)
    cnt_ref[0, :, :] = jnp.broadcast_to(counts_c[:, None], (Mt, 8))

    # all selection indicators as f32 one-hots (Mosaic: keep selects on
    # numeric operands; bool-valued selects / bool->float casts don't lower)
    first_f = jnp.where(mask & (c_incl == 1), 1.0, 0.0)  # first in-radius
    row0_f = jnp.where(lane == 0, 1.0, 0.0)
    # empty balls gather row 0 (ball_query_gpu.cu leaves idx zero-initialized)
    base_f = jnp.where((counts > 0)[:, None], first_f, row0_f)

    thi = thi_ref[0]  # (Np, Cp) bf16
    tlo = tlo_ref[0]
    dims = (((1,), (0,)), ((), ()))
    gs = []
    for k in range(nsample):
        sel_f = jnp.where(mask & (c_incl == k + 1), 1.0, 0.0)
        sel_f = jnp.where((k < counts_c)[:, None], sel_f, base_f)
        s = sel_f.astype(jnp.bfloat16)  # one-hot: exact in bf16
        g = jax.lax.dot_general(s, thi, dims, preferred_element_type=jnp.float32)
        g = g + jax.lax.dot_general(s, tlo, dims, preferred_element_type=jnp.float32)
        gs.append(g)
    # ONE store: per-k partial stores to the output block serialize Mosaic's
    # output pipeline (~450ms vs 0.3ms for this tile shape, measured)
    feat_ref[0, :, :] = jnp.concatenate(gs, axis=1)  # (Mt, K*Cp)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def ball_query_group_pallas(
    xyz: jax.Array, new_xyz: jax.Array, table: jax.Array,
    radius: float, nsample: int, interpret: bool = False,
):
    """Fused first-<=K-in-radius query + gather of `table` rows.

    Args:
      xyz: (B, N, 3) support points; new_xyz: (B, M, 3) centers;
      table: (B, N, C) float rows to gather (e.g. concat of xyz and
        features).

    Returns:
      gathered (B, M, K, C) f32 — table[b, idx[b, m, k], :] to ~16 mantissa
        bits for the reference ball-query idx (repeat-first padding, row 0
        for empty balls);
      idx (B, M, K) int32;
      counts (B, M) int32.
    """
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    C = table.shape[-1]
    M_TILE = fused_row_tile(M, N, C, nsample)
    assert M_TILE is not None, (M, N, C)  # callers check feasibility
    Mp = _round_up(M, M_TILE)
    Np = _round_up(N, 128)
    Cp = _round_up(C + 1, 128)

    planes = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    if Np != N:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, Np - N)),
                         constant_values=1e9)
    cen = jnp.transpose(new_xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, M)
    if Mp != M:
        cen = jnp.pad(cen, ((0, 0), (0, 0), (0, Mp - M)), constant_values=1e9)

    # augment the table with the lane index, pad, split hi/lo (both bf16
    # factors are exact against a one-hot row)
    lane_col = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.float32)[None, :, None], (B, N, 1)
    )
    tab = jnp.concatenate([table.astype(jnp.float32), lane_col], axis=-1)
    tab = jnp.pad(tab, ((0, 0), (0, Np - N), (0, Cp - (C + 1))))
    thi = tab.astype(jnp.bfloat16)
    tlo = (tab - thi.astype(jnp.float32)).astype(jnp.bfloat16)

    kernel = functools.partial(
        _ball_query_group_kernel, float(radius), nsample, N
    )
    grid = (B, Mp // M_TILE)
    feat, cnt = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, Np), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, M_TILE), lambda b, m: (b, 0, m),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, Cp), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, Cp), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, M_TILE, nsample * Cp), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M_TILE, 8), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Mp, nsample * Cp), jnp.float32),
            jax.ShapeDtypeStruct((B, Mp, 8), jnp.int32),
        ],
        interpret=interpret,
    )(planes, cen, thi, tlo)
    feat = feat.reshape(B, Mp, nsample, Cp)  # contiguous split: free bitcast
    gathered = feat[:, :M, :, :C]
    idx = jnp.round(feat[:, :M, :, C]).astype(jnp.int32)
    return gathered, idx, cnt[:, :M, 0]
