"""Windowed fused ball-query + gather for loop-invariant support clouds.

The denoiser's Feature-Transfer (FT) modules query the *condition* cloud —
a cloud that never changes across the T reverse-diffusion steps — from the
noisy cloud's positions (reference: FeatureMapModule,
pointnet2_modules.py:579-649, called from
pointnet2_with_pcld_condition.py:383-409,418-465).  Profiled on v5e, the
level-0 pair of FT queries (2048 centers x 3072 condition points, K=32)
plus their XLA kLoop index gathers cost ~2.7 ms of a ~10 ms denoise step:
the gathers run at ~20 GB/s because 64-128 B feature rows defeat the
(8,128) vector tiling.

This module replaces that chain with a spatially *windowed* kernel:

  * The support (condition) cloud is sorted once per generation along its
    widest axis (chosen per batch row); positions are split hi/lo into two
    bfloat16 halves so the gather can ride the MXU while reconstructing
    ~16 mantissa bits.
  * The queries are sorted along the same axis each step (one lax.sort of
    (B, M) keys — jnp.argsort lowers ~14x slower than lax.sort-with-iota
    on TPU, measured).  Each row tile of sorted queries then only needs the
    support slice whose keys fall inside [tile_min - r, tile_max + r]; the
    128-aligned slice starts ride in as scalar-prefetch arguments and the
    kernel dynamic-slices a fixed-width window W out of the VMEM-resident
    support planes and feature table.
  * Neighbor selection is exact first-<=K-in-*original*-index order (the
    reference ball_query semantics, ball_query_gpu.cu:9-47) computed
    without sorting or sequential min rounds: for every in-radius
    candidate its rank = number of in-radius candidates with smaller
    original index, obtained as ONE MXU matmul  rank = mask @ L  with
    L[w', w] = [orig(w') < orig(w)] built from the window's index column.
    The k-th neighbor's one-hot is then (rank == k) & mask, and each
    gather is a (Mt, W) x (W, 128) MXU matmul — the window, not the full
    cloud, pays the FLOPs.
  * Padding slots (k >= count) reuse the first neighbor's one-hot and
    empty balls substitute the center with zero features, matching
    QueryAndGroup(subset=False) (pointnet2_utils.py:376-410) so no
    (B, M, K, C) post-processing pass is needed at all.

A fixed W cannot cover pathological distributions (e.g. a plane normal to
every axis's window), so the wrapper computes the true per-tile candidate
span with searchsorted and falls back to the exact unwindowed path via
lax.cond when any tile overflows — the windowed path is an optimization,
never a semantics change (feature values are bf16-rounded like the lossy
gather path either way; positions reconstruct to ~16 mantissa bits).

Measured (v5e, B=4, M=2048, N=3072, K=32, C_out=128): 0.21 ms at W=512,
0.47 ms at W=1024 for query + all gathers fused, vs ~2.7 ms unfused.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _row_tile(m: int) -> int:
    """Query row-tile: a tile's key span scales with MT/M, so small query
    sets need proportionally smaller tiles (a 128-row tile of 256 queries
    spans HALF the sorted range and forces constant window escalation).
    Keep >= 8 tiles, capped at the 128 MXU row dim; PDR_WINDOW_MT overrides
    for tuning."""
    env = os.environ.get("PDR_WINDOW_MT")
    if env and m % int(env) == 0:
        return int(env)
    mt = 128
    while mt > 8 and m // mt < 8:
        mt //= 2
    return mt if m % mt == 0 else _round_up(m, 8)


def default_window(n: int) -> int:
    """Base window width: a quarter of the (lane-padded) support cloud
    unless overridden via PDR_WINDOW.  `windowed_ball_group` escalates to
    2W and then the exact fallback at runtime when a tile's true candidate
    span exceeds the tier, so any choice is correct — smaller is merely
    faster until escalations start."""
    env = os.environ.get("PDR_WINDOW")
    if env:
        return min(_round_up(int(env), 128), _round_up(n, 128))
    return max(256, min(_round_up(n, 128), _round_up(n // 4, 128)))


class SupportCtx(NamedTuple):
    """Per-generation (loop-invariant) sorted-support context."""

    axis_onehot: jax.Array   # (B, 3) f32 — per-batch sort axis selector
    keys: jax.Array          # (B, N) f32 sorted sort-keys
    planes: jax.Array        # (B, Np, 8) f32: x, y, z, orig-index, pad
    table_sorted: jax.Array  # (B, Np, CT) bf16 packed, sorted rows
    table_orig: jax.Array    # (B, N, CT) bf16 packed, original rows
    xyz_orig: jax.Array      # (B, N, 3) f32 — fallback ball query support
    feat_dims: tuple         # static: channel widths of each feature table
    n: int                   # static: true support size


# feat_dims / n are shape-like: keep them static (aux data) so a SupportCtx
# can ride through jit/scan boundaries without its ints becoming tracers.
jax.tree_util.register_pytree_node(
    SupportCtx,
    lambda s: (tuple(s[:6]), (s.feat_dims, s.n)),
    lambda aux, ch: SupportCtx(*ch, feat_dims=aux[0], n=aux[1]),
)


class QueryCtx(NamedTuple):
    """Per-step sorted-query context (shared by every consumer of the same
    query cloud)."""

    order: jax.Array      # (B, M) i32 sort permutation (sorted -> orig)
    inv_order: jax.Array  # (B, M) i32 inverse permutation (orig -> sorted)
    xyz_sorted: jax.Array  # (B, M, 3) f32
    keys: jax.Array       # (B, M) f32 sorted keys


def _hi_lo(x: jax.Array):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def build_support_ctx(
    xyz: jax.Array, features: Sequence[jax.Array]
) -> Optional[SupportCtx]:
    """Sort the support cloud and pack positions + feature tables.

    Args:
      xyz: (B, N, 3) f32 support positions.
      features: list of (B, N, Ci) feature tables to be gathered together.

    Returns None when the packed table would not fit the 128-lane budget.
    """
    B, N, _ = xyz.shape
    feat_dims = tuple(int(f.shape[-1]) for f in features)
    ct = 8 + sum(feat_dims)
    if ct > 128:
        return None
    xyz = xyz.astype(jnp.float32)
    # Per-batch sort axis: minimize the PEAK projected density, not maximize
    # the extent — a surface face perpendicular to the widest axis piles a
    # large fraction of the cloud onto one key value, and every query tile
    # overlapping it needs that whole pile in its window.  A 32-bin
    # histogram per axis (computed once per generation) picks the axis
    # whose fullest bin is smallest; extent breaks ties via the bin width.
    mins = jnp.min(xyz, axis=1)  # (B, 3)
    maxs = jnp.max(xyz, axis=1)
    span = jnp.maximum(maxs - mins, 1e-6)
    unit = (xyz - mins[:, None, :]) / span[:, None, :]  # (B, N, 3) in [0,1]
    bins = jnp.clip((unit * 32.0).astype(jnp.int32), 0, 31)  # (B, N, 3)
    onehot_bins = jax.nn.one_hot(bins, 32, dtype=jnp.float32)  # (B, N, 3, 32)
    peak = jnp.max(jnp.sum(onehot_bins, axis=1), axis=-1)  # (B, 3)
    axis_onehot = jax.nn.one_hot(jnp.argmin(peak, axis=-1), 3, dtype=jnp.float32)
    keys = jnp.einsum("bnc,bc->bn", xyz, axis_onehot)
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    keys_sorted, order = jax.lax.sort((keys, iota), dimension=1, num_keys=1)

    hi, lo = _hi_lo(xyz)
    ohi = jnp.floor_divide(iota, 128).astype(jnp.bfloat16)
    olo = jnp.mod(iota, 128).astype(jnp.bfloat16)
    cols = [hi, lo, ohi[..., None], olo[..., None]]
    cols += [f.astype(jnp.bfloat16) for f in features]
    table_orig = jnp.concatenate(cols, axis=-1)  # (B, N, CT)

    take = lambda a: jnp.take_along_axis(
        a, order[:, :, None].astype(jnp.int32), axis=1
    )
    table_sorted = take(table_orig)
    xyz_sorted = take(xyz)

    Np = _round_up(N, 128)
    planes = jnp.concatenate(
        [
            xyz_sorted,
            order[:, :, None].astype(jnp.float32),
            jnp.zeros((B, N, 4), jnp.float32),
        ],
        axis=-1,
    )
    if Np != N:
        pad = jnp.zeros((B, Np - N, 8), jnp.float32)
        pad = pad.at[:, :, :3].set(1e9)  # never in radius
        pad = pad.at[:, :, 3].set(2.0e6)  # never lowest original index
        planes = jnp.concatenate([planes, pad], axis=1)
        table_sorted = jnp.concatenate(
            [table_sorted, jnp.zeros((B, Np - N, table_sorted.shape[-1]),
                                     jnp.bfloat16)], axis=1
        )
    return SupportCtx(
        axis_onehot=axis_onehot,
        keys=keys_sorted,
        planes=planes,
        table_sorted=table_sorted,
        table_orig=table_orig,
        xyz_orig=xyz,
        feat_dims=feat_dims,
        n=N,
    )


def build_query_ctx(new_xyz: jax.Array, axis_onehot: jax.Array) -> QueryCtx:
    """Sort the query cloud along the support's per-batch axis."""
    B, M, _ = new_xyz.shape
    new_xyz = new_xyz.astype(jnp.float32)
    keys = jnp.einsum("bmc,bc->bm", new_xyz, axis_onehot)
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    keys_sorted, order = jax.lax.sort((keys, iota), dimension=1, num_keys=1)
    # inverse permutation via scatter-free sort of (order, iota)
    _, inv = jax.lax.sort((order, iota), dimension=1, num_keys=1)
    xyz_sorted = jnp.take_along_axis(new_xyz, order[:, :, None], axis=1)
    return QueryCtx(order=order, inv_order=inv, xyz_sorted=xyz_sorted,
                    keys=keys_sorted)


def unsort_rows(x: jax.Array, ctx: QueryCtx) -> jax.Array:
    """Undo the query sort on a per-center tensor (B, M, ...)."""
    # out[order[i]] = x[i]  <=>  out = x[inv_order]
    idx = ctx.inv_order
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
    )


def sort_rows(x: jax.Array, ctx: QueryCtx) -> jax.Array:
    """Bring a per-center tensor (B, M, ...) into sorted-query order."""
    idx = ctx.order
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
    )


def _window_kernel(radius, nsample, W, feat_dims, out_cols, include_center,
                   empty_mode, starts_ref, sup_ref, q_ref, tab_ref, row0_ref,
                   out_ref, cnt_ref):
    """Grid (B, M/MT).  Resident support planes/table dynamic-sliced to the
    tile's window; rank-matmul first-K selection; per-k MXU gathers."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    MT = q_ref.shape[-2]
    start = pl.multiple_of(starts_ref[b, t], 128)
    sup = sup_ref[0, pl.ds(start, W), :]     # (W, 8) f32
    tab = tab_ref[0, pl.ds(start, W), :]     # (W, CT) bf16
    qT = q_ref[0]                             # (MT, 8) f32
    supT = jnp.transpose(sup)                 # (8, W)
    d = None
    for c in range(3):
        diff = qT[:, c][:, None] - supT[c, :][None, :]  # (MT, W)
        d = diff * diff if d is None else d + diff * diff
    mask = d < jnp.float32(radius * radius)
    counts = jnp.minimum(jnp.sum(mask.astype(jnp.int32), axis=1), nsample)
    cnt_ref[0, :, :] = jnp.broadcast_to(counts[:, None], (MT, 8))
    have = (counts > 0)[:, None]              # (MT, 1)

    orig_s = sup[:, 3][:, None]               # (W, 1)
    orig_l = supT[3, :][None, :]              # (1, W)
    L = jnp.where(orig_s < orig_l, 1.0, 0.0).astype(jnp.bfloat16)
    mb = jnp.where(mask, 1.0, 0.0).astype(jnp.bfloat16)
    rank = jax.lax.dot_general(mb, L, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (MT, W)

    zeros_pad = None
    base = None
    pieces = []
    for k in range(nsample):
        sel = jnp.where(mask & (rank == k), 1.0, 0.0)
        if base is None:
            base = sel
        sel = jnp.where((k < counts)[:, None], sel, base)
        s = sel.astype(jnp.bfloat16)
        g = jax.lax.dot_general(s, tab, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (MT, CT)
        if empty_mode == "row0":
            # subset=True semantics: the reference ball query leaves idx=0 for
            # empty balls (ball_query_gpu.cu:9-47 zero-initialized output), so
            # every slot gathers support row 0 — its packed row rides in as a
            # dedicated (1, CT) operand since row 0 may fall outside the window.
            g = jnp.where(have, g, row0_ref[0, 0].astype(jnp.float32))
        absx = g[:, 0:3] + g[:, 3:6]          # reconstructed f32 positions
        if empty_mode == "center_zero":
            # empty balls: substitute the center itself, zero features
            # (QueryAndGroup subset=False, pointnet2_utils.py:376-410)
            absx = jnp.where(have, absx, qT[:, :3])
        rel = absx - qT[:, :3]
        relb = rel.astype(jnp.bfloat16)
        absb = absx.astype(jnp.bfloat16)
        centerb = qT[:, :3].astype(jnp.bfloat16)
        pos_cols = 9 if include_center else 6
        off = 8
        sub = []
        for fd in feat_dims:
            sub.append(g[:, off:off + fd].astype(jnp.bfloat16))
            sub.append(relb)
            sub.append(absb)
            if include_center:
                sub.append(centerb)
            off += fd
        sub.append(g[:, 6:8].astype(jnp.bfloat16))  # orig hi/lo -> idx
        used = sum(fd + pos_cols for fd in feat_dims) + 2
        if used < out_cols:
            if zeros_pad is None:
                zeros_pad = jnp.zeros((MT, out_cols - used), jnp.bfloat16)
            sub.append(zeros_pad)
        pieces.append(jnp.concatenate(sub, axis=1))
    out_ref[0, :, :] = jnp.concatenate(pieces, axis=1)  # (MT, K*out_cols)


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10, 11))
def _windowed_call(planes, table_sorted, q_sorted8, starts, row0,
                   radius: float, nsample: int, W: int, feat_dims: tuple,
                   include_center: bool = False, empty_mode: str = "center_zero",
                   interpret: bool = False):
    B, Np, _ = planes.shape
    M = q_sorted8.shape[-2]
    MT = _row_tile(M)
    assert M % MT == 0, (M, MT)
    CT = table_sorted.shape[-1]
    pos_cols = 9 if include_center else 6
    out_cols = _round_up(sum(fd + pos_cols for fd in feat_dims) + 2, 128)
    kernel = functools.partial(
        _window_kernel, float(radius), nsample, W, feat_dims, out_cols,
        include_center, empty_mode,
    )
    grid = (B, M // MT)
    out, cnt = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, Np, 8), lambda b, t, s: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                # queries (B, M, 8): MT rides the sublane dim (divisible by
                # 8 down to MT=8) — an (8, MT) layout would put MT on lanes,
                # which real-TPU lowering rejects for MT < 128
                pl.BlockSpec((1, MT, 8), lambda b, t, s: (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Np, CT), lambda b, t, s: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                # (1, 1, CT): every block dim equals 1 or the full array dim,
                # which real-TPU lowering requires (a (1, CT) block of a
                # (B, CT) array is rejected when B > 1 and CT % 128 != 0)
                pl.BlockSpec((1, 1, CT), lambda b, t, s: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, MT, nsample * out_cols),
                             lambda b, t, s: (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, MT, 8), lambda b, t, s: (b, t, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        out_shape=[
            jax.ShapeDtypeStruct((B, M, nsample * out_cols), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, M, 8), jnp.int32),
        ],
        interpret=interpret,
    )(starts, planes, q_sorted8, table_sorted, row0)
    return out.reshape(B, M, nsample, out_cols), cnt[:, :, 0]


def _fallback_group(sup: SupportCtx, q: QueryCtx, radius, nsample,
                    include_center: bool = False,
                    empty_mode: str = "center_zero"):
    """Exact unwindowed path with bit-identical outputs to the kernel:
    full Pallas/XLA ball query on the original support order + lossy
    (single-bf16) gathers of the same packed table."""
    from .neighbors import ball_query
    from .sampling import group_points

    idx, counts = ball_query(sup.xyz_orig, q.xyz_sorted, radius, nsample)
    counts = jnp.minimum(counts, nsample)
    # (B, M, K, CT); the TPU one-hot gather accumulates in f32 — cast back
    # (exact: gathered values are bf16 table entries) so both lax.cond
    # branches agree on dtype
    g = group_points(sup.table_orig, idx, lossy=True).astype(jnp.bfloat16)
    gf = g.astype(jnp.float32)
    absx = gf[..., 0:3] + gf[..., 3:6]
    have = (counts > 0)[:, :, None, None]
    center = q.xyz_sorted[:, :, None, :]
    if empty_mode == "center_zero":
        # subset=False: empty balls substitute the center, zero features
        absx = jnp.where(have, absx, center)
    # empty_mode == "row0": ball_query leaves idx=0 for empty balls, so the
    # gather above already holds support row 0 — nothing to substitute
    rel = absx - center
    relb = rel.astype(jnp.bfloat16)
    absb = absx.astype(jnp.bfloat16)
    centerb = jnp.broadcast_to(center, absx.shape).astype(jnp.bfloat16)
    pos_cols = 9 if include_center else 6
    pieces = []
    off = 8
    for fd in sup.feat_dims:
        if empty_mode == "center_zero":
            pieces.append(jnp.where(have, g[..., off:off + fd], 0))
        else:
            pieces.append(g[..., off:off + fd])
        pieces.append(relb)
        pieces.append(absb)
        if include_center:
            pieces.append(centerb)
        off += fd
    pieces.append(g[..., 6:8])
    out_cols = _round_up(sum(fd + pos_cols for fd in sup.feat_dims) + 2, 128)
    used = sum(fd + pos_cols for fd in sup.feat_dims) + 2
    if used < out_cols:
        B, M = idx.shape[:2]
        pieces.append(jnp.zeros((B, M, nsample, out_cols - used), jnp.bfloat16))
    return jnp.concatenate(pieces, axis=-1), counts


class WindowedGroups(NamedTuple):
    grouped: tuple      # one (B, M, K, Ci + 6|9) bf16 per feature table,
                        # channel order [feats, rel_xyz, abs_xyz(, center)],
                        # sorted-query order
    counts: jax.Array   # (B, M) i32, sorted-query order
    idx: jax.Array      # (B, M, K) i32 original support indices
    fell_back: jax.Array  # () bool — true when the window overflowed


def windowed_ball_group(
    sup: SupportCtx,
    q: QueryCtx,
    radius: float,
    nsample: int,
    window: Optional[int] = None,
    include_center: bool = False,
    empty_mode: str = "center_zero",
    interpret: bool = False,
) -> WindowedGroups:
    """First-<=K-in-index-order ball grouping of every packed feature table
    against a sorted support, windowed along the sort axis.

    Outputs are in *sorted-query* order: run per-center work (MLP /
    attention pooling) in that order and `unsort_rows` the pooled result.

    empty_mode: what an empty ball yields — "center_zero" substitutes the
    center position with zero features (QueryAndGroup subset=False,
    pointnet2_utils.py:376-410); "row0" gathers support row 0 like the
    reference ball query's zero-initialized idx (subset=True,
    ball_query_gpu.cu:9-47).
    """
    B, Np, _ = sup.planes.shape
    M = q.xyz_sorted.shape[1]
    W = window if window is not None else default_window(sup.n)
    W = min(W, Np)
    MT = _row_tile(M)
    assert M % MT == 0, (M, MT)

    tiles = q.keys.reshape(B, M // MT, MT)
    lo = tiles.min(-1) - radius
    hi = tiles.max(-1) + radius
    raw = jax.vmap(lambda k, l: jnp.searchsorted(k, l))(sup.keys, lo)
    ends = jax.vmap(lambda k, h: jnp.searchsorted(k, h, side="right"))(
        sup.keys, hi
    )
    a128 = ((raw // 128) * 128).astype(jnp.int32)

    q8 = jnp.concatenate(
        [q.xyz_sorted, jnp.zeros((B, M, 5), jnp.float32)], axis=-1
    )  # (B, M, 8)

    row0 = sup.table_orig[:, :1, :]  # (B, 1, CT) — "row0" empty-ball substitute

    def tier_call(w):
        starts = jnp.clip(a128, 0, max(Np - w, 0))

        def call(_):
            return _windowed_call(
                sup.planes, sup.table_sorted, q8, starts, row0,
                float(radius), nsample, w, sup.feat_dims, include_center,
                empty_mode, interpret,
            )

        return jnp.any(ends > starts + w), call

    def fallback(_):
        return _fallback_group(
            sup, q, radius, nsample, include_center, empty_mode
        )

    # escalate W -> 2W -> exact fallback: per-step data (early-diffusion
    # gaussians, surface-density peaks) decides at runtime; the narrow tier
    # costs ~W MACs per gathered element so the common case stays cheap.
    # The widest tier is the UNFUSED exact path on purpose: running the
    # fused kernel at W = Np was measured slower (2.6 vs 1.8 ms at the
    # level-0 FT shapes) — the O(W^2) rank matmul and K x (MT, W, 128)
    # gather matmuls overtake the dedicated cumsum ball-query kernel + XLA
    # one-hot gathers once the window stops shrinking the support.
    over_w, call_w = tier_call(W)
    if W >= Np:
        out, counts = call_w(None)
        overflow = jnp.zeros((), bool)
    else:
        W2 = min(2 * W, Np)
        if W2 > W and W2 < Np:
            over_w2, call_w2 = tier_call(W2)

            def escalate(_):
                return jax.lax.cond(over_w2, fallback, call_w2, None)

            overflow = jnp.logical_and(over_w, over_w2)  # exact path taken
        else:
            escalate = fallback
            overflow = over_w
        out, counts = jax.lax.cond(over_w, escalate, call_w, operand=None)

    pos_cols = 9 if include_center else 6
    used = []
    off = 0
    for fd in sup.feat_dims:
        used.append(out[..., off:off + fd + pos_cols])
        off += fd + pos_cols
    ihi = out[..., off].astype(jnp.int32)
    ilo = out[..., off + 1].astype(jnp.int32)
    idx = ihi * 128 + ilo
    return WindowedGroups(
        grouped=tuple(used), counts=counts, idx=idx, fell_back=overflow
    )
