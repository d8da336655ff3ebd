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

A fixed W cannot cover pathological tiles (a dense support cluster that
no projection axis spreads — mirrored MVP partials put >50% of the
support inside one 2r key slab — or a sparse query tile whose keys span
the whole support), so each tile carries a per-tile mode decided by a
searchsorted span check on the host side of the call:

  * span <= W   -> the windowed path above (start rides in as the
    prefetched scalar);
  * span <= 2W  -> the same path over a 2W MID window (scalar encodes the
    mid start as -(start+2)), so the base W tracks the COMMON-case span
    while 2W absorbs tiles near the dense slab;
  * otherwise   -> the SAME grid step scans the full support in ORIGINAL
    index order (a second operand pair holds unsorted planes + table):
    there first-<=K selection needs no rank matmul at all — an inclusive
    lane cumsum of the in-radius mask IS the selection rank, so the wide
    tile costs one (MT, Np) distance pass + cumsum + the same per-k MXU
    gathers, ~4x a W=Np/4 narrow tile instead of ~40x for an O(Np^2) rank.

All modes execute under `pl.when` inside one kernel launch, so per-step
cost degrades smoothly with the number of mid/wide tiles — no lax.cond
escalation, no whole-call fallback, no repair copies.  Outputs are exact
in every mode (feature values are bf16-rounded like the lossy gather
path; positions reconstruct to ~16 mantissa bits).

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
    planes_orig: jax.Array   # (B, Np, 8) f32 original rows (wide tiles)
    table_orig: jax.Array    # (B, Np, CT) bf16 packed, original rows
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


def _perm_rows_mxu(x: jax.Array, perm: jax.Array) -> jax.Array:
    """Permute rows of a bf16 (B, N, C) table as a one-hot MXU contraction.

    take_along_axis lowers to a ~10 GB/s scalar kLoop fusion on TPU; the
    one-hot matmul runs on the MXU (~20x) and is EXACT for bf16 payloads
    (one-hot factor exact, f32 accumulation of single bf16 products).  XLA
    fuses the iota==perm comparison into the contraction operand, so the
    (B, N, N) one-hot never materializes.  out[b, m] = x[b, perm[b, m]].
    Off-TPU (CPU tests) the einsum would be emulated bf16 — fall back to
    the gather there.
    """
    if jax.default_backend() != "tpu":
        return jnp.take_along_axis(x, perm[:, :, None], axis=1)
    oh = jax.nn.one_hot(perm, x.shape[1], dtype=jnp.bfloat16)
    return jnp.einsum(
        "bmn,bnc->bmc", oh, x, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def build_support_ctx(
    xyz: jax.Array, features: Sequence[jax.Array], max_ct: int = 128
) -> Optional[SupportCtx]:
    """Sort the support cloud and pack positions + feature tables.

    Args:
      xyz: (B, N, 3) f32 support positions.
      features: list of (B, N, Ci) feature tables to be gathered together.
      max_ct: packed-table lane budget; every extra lane multiplies the
        per-slot MXU gather cost, so callers with narrow tables keep the
        128 default.

    Returns None when the packed table would not fit the lane budget.
    """
    B, N, _ = xyz.shape
    feat_dims = tuple(int(f.shape[-1]) for f in features)
    ct = 8 + sum(feat_dims)
    if ct > max_ct:
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
    # xyz rides the sort as payload operands (exact f32, no gather); the
    # bf16 table is permuted by one MXU matmul (exact for bf16 payloads)
    keys_sorted, order, sx, sy, sz = jax.lax.sort(
        (keys, iota, xyz[..., 0], xyz[..., 1], xyz[..., 2]),
        dimension=1, num_keys=1,
    )
    xyz_sorted = jnp.stack([sx, sy, sz], axis=-1)

    hi, lo = _hi_lo(xyz)
    ohi = jnp.floor_divide(iota, 128).astype(jnp.bfloat16)
    olo = jnp.mod(iota, 128).astype(jnp.bfloat16)
    cols = [hi, lo, ohi[..., None], olo[..., None]]
    cols += [f.astype(jnp.bfloat16) for f in features]
    table_orig = jnp.concatenate(cols, axis=-1)  # (B, N, CT)
    table_sorted = _perm_rows_mxu(table_orig, order)

    Np = _round_up(N, 128)

    def mk_planes(xyz_rows, idx_col, key_col):
        # col 4 carries the sort key: the kNN kernel checks its k-th
        # neighbor distance against the window-edge keys (the ball-query
        # kernel ignores it)
        p = jnp.concatenate(
            [
                xyz_rows,
                idx_col[:, :, None].astype(jnp.float32),
                key_col[:, :, None].astype(jnp.float32),
                jnp.zeros((B, N, 3), jnp.float32),
            ],
            axis=-1,
        )
        if Np != N:
            pad = jnp.zeros((B, Np - N, 8), jnp.float32)
            pad = pad.at[:, :, :3].set(1e9)  # never in radius
            pad = pad.at[:, :, 3].set(2.0e6)  # never lowest original index
            pad = pad.at[:, :, 4].set(1e9)   # keys beyond every real key
            p = jnp.concatenate([p, pad], axis=1)
        return p

    def pad_table(tb):
        if Np == N:
            return tb
        return jnp.concatenate(
            [tb, jnp.zeros((B, Np - N, tb.shape[-1]), jnp.bfloat16)], axis=1
        )

    return SupportCtx(
        axis_onehot=axis_onehot,
        keys=keys_sorted,
        planes=mk_planes(xyz_sorted, order, keys_sorted),
        table_sorted=pad_table(table_sorted),
        planes_orig=mk_planes(xyz, iota, keys),
        table_orig=pad_table(table_orig),
        feat_dims=feat_dims,
        n=N,
    )


def build_query_ctx(new_xyz: jax.Array, axis_onehot: jax.Array) -> QueryCtx:
    """Sort the query cloud along the support's per-batch axis."""
    B, M, _ = new_xyz.shape
    new_xyz = new_xyz.astype(jnp.float32)
    keys = jnp.einsum("bmc,bc->bm", new_xyz, axis_onehot)
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    # xyz rides the sort as payload operands (exact f32, no kLoop gather)
    keys_sorted, order, sx, sy, sz = jax.lax.sort(
        (keys, iota, new_xyz[..., 0], new_xyz[..., 1], new_xyz[..., 2]),
        dimension=1, num_keys=1,
    )
    xyz_sorted = jnp.stack([sx, sy, sz], axis=-1)
    # inverse permutation via scatter-free sort of (order, iota)
    _, inv = jax.lax.sort((order, iota), dimension=1, num_keys=1)
    return QueryCtx(order=order, inv_order=inv, xyz_sorted=xyz_sorted,
                    keys=keys_sorted)


def unsort_rows(x: jax.Array, ctx: QueryCtx) -> jax.Array:
    """Undo the query sort on a per-center tensor (B, M, ...)."""
    # out[order[i]] = x[i]  <=>  out = x[inv_order]
    idx = ctx.inv_order
    if x.ndim == 3 and x.dtype == jnp.bfloat16:
        return _perm_rows_mxu(x, idx)
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
    )


def sort_rows(x: jax.Array, ctx: QueryCtx) -> jax.Array:
    """Bring a per-center tensor (B, M, ...) into sorted-query order."""
    idx = ctx.order
    if x.ndim == 3 and x.dtype == jnp.bfloat16:
        return _perm_rows_mxu(x, idx)
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
    )


def _pack_slots(nsample, feat_dims, out_cols, include_center, empty_mode,
                qT, row0_ref, mask, slot_rank, tab, counts, have):
    """Shared per-k gather + channel packing.

    mask/slot_rank: (MT, Wn) over the candidate set (window or full
    support); slot k selects the candidate with slot_rank == k.  Returns
    the (MT, K*out_cols) packed bf16 block.

    Per-slot work on the (MT, Wn) width is kept to TWO VPU passes (one
    compare, one select-to-bf16): the in-radius mask is folded into the
    rank ONCE (out-of-radius candidates get rank -1, matching no slot),
    and the count-padding / empty-ball substitutions act on the gathered
    (MT, CT) rows — CT is 6x narrower than a 768-wide window, and a
    padded slot's gather equals slot 0's gather by construction (no
    in-radius candidate has rank >= count, so its selection row is zero)."""
    MT = qT.shape[0]
    rank_m = jnp.where(mask, slot_rank, jnp.asarray(-1, slot_rank.dtype))
    zeros_pad = None
    g0 = None
    pieces = []
    for k in range(nsample):
        # f32 select + convert: Mosaic rejects selecting bf16 straight off
        # an f32-compare mask (i1 (8,128) -> (16,128) relayout)
        s = jnp.where(rank_m == k, 1.0, 0.0).astype(jnp.bfloat16)
        g = jax.lax.dot_general(s, tab, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (MT, CT)
        if g0 is None:
            g0 = g
        else:
            # slots k >= count repeat slot 0 (reference repeat-first padding)
            g = jnp.where((k < counts)[:, None], g, g0)
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
    return jnp.concatenate(pieces, axis=1)  # (MT, K*out_cols)


def _cumsum_lanes(x: jax.Array) -> jax.Array:
    """Inclusive lane-axis cumulative sum via log-shift adds (Mosaic has no
    native scan)."""
    n = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < n:
        shifted = pltpu.roll(x, s, axis=1)
        x = x + jnp.where(lane >= s, shifted, 0)
        s *= 2
    return x


def _compact_width(W: int) -> int:
    """Candidate-compaction width: a query tile's in-radius candidate UNION
    is far smaller than the window that covers its key span, so the per-k
    gather matmuls can contract over a compacted Wc-row table instead of W.

    NEGATIVE RESULT on v5e at the shipped shapes (measured, do not re-enable
    without re-measuring): OFF by default.  Building the (Wc, Wn) selection
    one-hot is O(Wc*Wn) VPU work — the same area the rank matmul covers in
    MXU MACs, but VPU element ops are ~10x costlier, so the preamble dwarfs
    the gather savings: full step 5.18 -> 7.06/7.54/8.04 ms at
    Wc=256/384/512 (FT-0 kernel 0.56 -> 1.82 ms).  Kept bit-parity-tested
    (TestCandidateCompaction) because the math is exact and the trade flips
    where gathers dominate harder (much larger N or wider K*CT).
    PDR_COMPACT=1 enables; PDR_COMPACT_WC overrides the width (tests force
    tiny Wc to exercise the in-kernel overflow fallback)."""
    if os.environ.get("PDR_COMPACT", "0") != "1":
        return 0
    env = os.environ.get("PDR_COMPACT_WC")
    wc = int(env) if env else 256
    return wc if wc < W else 0


def _window_kernel(radius, nsample, W, W2, Wc, feat_dims, out_cols,
                   include_center, empty_mode, starts_ref, sup_ref, q_ref,
                   tab_ref, sup_o_ref, tab_o_ref, row0_ref, out_ref, cnt_ref):
    """Grid (B, M/MT).  Per-tile mode from the prefetched scalar:

      * start >= 0  -> a W-wide window of the sorted support (rank-matmul
        first-K selection);
      * start <= -2 -> a W2-wide (2W) MID window at -(start+2) — same
        selection, double width — so the base W can sit at the common-case
        span instead of the worst-case one;
      * start == -1 -> WIDE: scan the full support in ORIGINAL index order,
        where an inclusive mask-cumsum IS the selection rank (no O(Np^2)
        rank matmul)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    MT = q_ref.shape[-2]
    s0 = starts_ref[b, t]
    qT = q_ref[0]                             # (MT, 8) f32
    r2 = jnp.float32(radius * radius)

    def _sorted_tile(start, Wn):
        start = pl.multiple_of(start, 128)
        sup = sup_ref[0, pl.ds(start, Wn), :]     # (Wn, 8) f32
        tab = tab_ref[0, pl.ds(start, Wn), :]     # (Wn, CT) bf16
        supT = jnp.transpose(sup)                 # (8, Wn)
        d = None
        for c in range(3):
            diff = qT[:, c][:, None] - supT[c, :][None, :]  # (MT, Wn)
            d = diff * diff if d is None else d + diff * diff
        mask = d < r2
        counts = jnp.minimum(
            jnp.sum(mask.astype(jnp.int32), axis=1), nsample
        )
        cnt_ref[0, :, :] = jnp.broadcast_to(counts[:, None], (MT, 8))
        have = (counts > 0)[:, None]              # (MT, 1)

        def _rank_and_pack(mask_w, tab_w, orig_row):
            # selection rank = number of in-radius candidates with smaller
            # ORIGINAL index, one MXU matmul against the pairwise
            # comparison matrix built from the (exact) index column
            L = jnp.where(
                orig_row[:, None] < orig_row[None, :], 1.0, 0.0
            ).astype(jnp.bfloat16)
            mb = jnp.where(mask_w, 1.0, 0.0).astype(jnp.bfloat16)
            rank = jax.lax.dot_general(mb, L, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            out_ref[0, :, :] = _pack_slots(
                nsample, feat_dims, out_cols, include_center, empty_mode,
                qT, row0_ref, mask_w, rank, tab_w, counts, have,
            )

        if Wc and Wc < Wn:
            # Candidate compaction: the tile's in-radius candidate UNION is
            # usually far under Wn, so gather the <=Wc candidate table rows
            # once (one-hot MXU matmul, exact) and run the rank + per-k
            # gathers on the compacted width.  The mask is compacted by an
            # exact 0/1 matmul — never recomputed from reconstructed
            # positions, so selection is bit-identical to the full path.
            tile_mask = jnp.any(mask, axis=0, keepdims=True)     # (1, Wn)
            crank = _cumsum_lanes(tile_mask.astype(jnp.int32)) - 1
            n_cand = jnp.sum(tile_mask.astype(jnp.int32))

            @pl.when(n_cand <= Wc)
            def _compact():
                slot = jax.lax.broadcasted_iota(jnp.int32, (Wc, Wn), 0)
                sel = jnp.where(
                    (slot == crank) & tile_mask, 1.0, 0.0
                ).astype(jnp.bfloat16)                           # (Wc, Wn)
                tab_c = jax.lax.dot_general(
                    sel, tab, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)                           # (Wc, CT)
                mask_c = jax.lax.dot_general(
                    jnp.where(mask, 1.0, 0.0).astype(jnp.bfloat16),
                    jnp.transpose(sel),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) > 0.5                                          # (MT, Wc)
                # orig index from the table's exact hi/lo channels; empty
                # slots (all-zero rows) decode to 0 but their mask_c
                # columns are zero, so they never contribute
                orig_c = tab_c[:, 6].astype(jnp.float32) * 128.0 \
                    + tab_c[:, 7].astype(jnp.float32)
                _rank_and_pack(mask_c, tab_c, orig_c)

            @pl.when(n_cand > Wc)
            def _full():
                _rank_and_pack(mask, tab, supT[3, :])
        else:
            _rank_and_pack(mask, tab, supT[3, :])

    @pl.when(s0 >= 0)
    def _narrow():
        _sorted_tile(jnp.maximum(s0, 0), W)

    if W2 > W:
        @pl.when(s0 <= -2)
        def _mid():
            _sorted_tile(jnp.maximum(-(s0 + 2), 0), W2)

    @pl.when(s0 == -1)
    def _wide():
        sup = sup_o_ref[0]                        # (Np, 8) f32, orig order
        tab = tab_o_ref[0]                        # (Np, CT) bf16
        supT = jnp.transpose(sup)
        d = None
        for c in range(3):
            diff = qT[:, c][:, None] - supT[c, :][None, :]  # (MT, Np)
            d = diff * diff if d is None else d + diff * diff
        mask = d < r2                              # pad rows at 1e9 excluded
        counts = jnp.minimum(
            jnp.sum(mask.astype(jnp.int32), axis=1), nsample
        )
        cnt_ref[0, :, :] = jnp.broadcast_to(counts[:, None], (MT, 8))
        have = (counts > 0)[:, None]
        rank = _cumsum_lanes(mask.astype(jnp.int32)) - 1  # 0-based
        out_ref[0, :, :] = _pack_slots(
            nsample, feat_dims, out_cols, include_center, empty_mode,
            qT, row0_ref, mask, rank, tab, counts, have,
        )


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 12, 13, 14))
def _windowed_call(planes, table_sorted, q_sorted8, starts, planes_orig,
                   table_orig, row0,
                   radius: float, nsample: int, W: int, feat_dims: tuple,
                   include_center: bool = False, empty_mode: str = "center_zero",
                   interpret: bool = False, Wc: int = 0):
    B, Np, _ = planes.shape
    M = q_sorted8.shape[-2]
    MT = _row_tile(M)
    assert M % MT == 0, (M, MT)
    CT = table_sorted.shape[-1]
    pos_cols = 9 if include_center else 6
    out_cols = _round_up(sum(fd + pos_cols for fd in feat_dims) + 2, 128)
    W2 = 2 * W if 2 * W < Np else W  # mid tier only when it beats the wide scan
    kernel = functools.partial(
        _window_kernel, float(radius), nsample, W, W2, Wc,
        feat_dims, out_cols, include_center, empty_mode,
    )
    grid = (B, M // MT)
    full_spec = pl.BlockSpec((1, Np, 8), lambda b, t, s: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((1, Np, CT), lambda b, t, s: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    out, cnt = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                full_spec,
                # queries (B, M, 8): MT rides the sublane dim (divisible by
                # 8 down to MT=8) — an (8, MT) layout would put MT on lanes,
                # which real-TPU lowering rejects for MT < 128
                pl.BlockSpec((1, MT, 8), lambda b, t, s: (b, t, 0),
                             memory_space=pltpu.VMEM),
                table_spec,
                full_spec,
                table_spec,
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
    )(starts, planes, q_sorted8, table_sorted, planes_orig, table_orig, row0)
    return out.reshape(B, M, nsample, out_cols), cnt[:, :, 0]


class WindowedGroups(NamedTuple):
    grouped: tuple      # one (B, M, K, Ci + 6|9) bf16 per feature table,
                        # channel order [feats, rel_xyz, abs_xyz(, center)],
                        # sorted-query order
    counts: jax.Array   # (B, M) i32, sorted-query order
    idx: jax.Array      # (B, M, K) i32 original support indices
    fell_back: jax.Array  # () bool — true when any tile ran the wide
                          # (full-support original-order) path


def windowed_ball_group(
    sup: SupportCtx,
    q: QueryCtx,
    radius: float,
    nsample: int,
    window: Optional[int] = None,
    include_center: bool = False,
    empty_mode: str = "center_zero",
    interpret: bool = False,
    emit_idx: bool = True,
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

    Tiles whose true candidate span exceeds the window run the full-support
    wide mode inside the same kernel launch (see module docstring) — the
    result is exact for every tile, with no whole-call escalation.

    Accepts either support orientation: a SupportCtxT routes to the
    transposed kernel (same values, M-minor outputs).
    """
    if isinstance(sup, SupportCtxT):
        if q.xyz_sorted.shape[1] % 128 != 0:
            raise ValueError(
                "windowed_ball_group: SupportCtxT (transposed kernel) needs "
                f"query count % 128 == 0, got {q.xyz_sorted.shape[1]}; build "
                "the support with build_support_ctx (lane orientation, "
                "handles M % 8 == 0) or set PDR_WINDOWED_T=0"
            )
        return windowed_ball_group_t(
            sup, q, radius, nsample, window=window,
            include_center=include_center, empty_mode=empty_mode,
            interpret=interpret, emit_idx=emit_idx,
        )
    B, Np, _ = sup.planes.shape
    M = q.xyz_sorted.shape[1]
    W = window if window is not None else default_window(sup.n)
    W = min(W, Np)
    MT = _row_tile(M)
    assert M % MT == 0, (M, MT)

    # per-tile tier decision (narrow W / mid 2W / wide) shared with the
    # transposed orientation — the two kernels' bit-parity depends on the
    # same a128 alignment, clip bounds, and W2 rule
    scal, wide = _tier_starts(sup.keys, q.keys, radius, W, Np, M, MT)
    _record_window_macs(B, M, W, nsample, sup.table_orig.shape[-1])

    q8 = jnp.concatenate(
        [q.xyz_sorted, jnp.zeros((B, M, 5), jnp.float32)], axis=-1
    )  # (B, M, 8)

    row0 = sup.table_orig[:, :1, :]  # (B, 1, CT) — "row0" empty-ball substitute

    out, counts = _windowed_call(
        sup.planes, sup.table_sorted, q8, scal, sup.planes_orig,
        sup.table_orig, row0,
        float(radius), nsample, W, sup.feat_dims, include_center,
        empty_mode, interpret, _compact_width(W),
    )
    overflow = jnp.any(wide)

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


# ---------------------------------------------------------------------------
# Transposed windowed ball grouping (queries on LANES)
# ---------------------------------------------------------------------------
#
# The kernel above emits (B, M, K*out_cols) with each slot's gathered row
# padded to 128 LANES (out_cols >= 128): every per-slot gather matmul
# (MT, Wn) @ (Wn, CT) pays the MXU for 128 output lanes while only ~44 are
# real, the packed output is 2-3x larger than its payload, and XLA then
# relayout-copies the whole thing because every downstream fusion holds the
# big (B, M, K, C) tensors M-minor (M=2048 tiles cleanly; C=32-50 pads).
#
# The transposed formulation puts QUERIES on the lane axis end to end:
#
#   * distances, mask, rank are (Wn, MT) — candidates on sublanes;
#   * the rank matmul is L^T @ mask^T (same MACs as before);
#   * each per-slot gather is  tab^T (CT, Wn) @ onehot^T (Wn, MT) — the MXU
#     streams CT~44 rows instead of 128 padded lanes (~2.7x fewer cycles)
#     and the MT=128 output lanes are fully used;
#   * the output block is (K*out_sub, MT): M-minor, exactly the physical
#     layout XLA wants, so the downstream transpose-to-(B, M, K, C) is
#     layout-only and the 64 MB relayout copies disappear.
#
# Shares the host-side tier logic (W -> 2W -> exact full-support scan) and
# produces bit-identical values to `windowed_ball_group` (same selection
# math, same bf16 roundings) — asserted in tests/test_pallas_window.py.


class SupportCtxT(NamedTuple):
    """Sorted-support context for the transposed kernel.  Tables are stored
    channel-major (B, CT, Np) so the in-kernel window slice is a 128-aligned
    LANE slice and the gather matmul needs no transposes."""

    axis_onehot: jax.Array    # (B, 3) f32
    keys: jax.Array           # (B, N) f32 sorted keys
    planes: jax.Array         # (B, Np, 8) f32 sorted rows (window columns)
    planes_row: jax.Array     # (B, 8, Np) f32 sorted, row-major planes
    table_t: jax.Array        # (B, CT, Np) bf16 sorted, channel-major
    planes_orig: jax.Array    # (B, Np, 8) f32 original order
    planes_orig_row: jax.Array  # (B, 8, Np) f32 original order
    table_orig_t: jax.Array   # (B, CT, Np) bf16 original order
    row0: jax.Array           # (B, CT, 128) bf16 — support row 0, lane-bcast
    feat_dims: tuple          # static
    n: int                    # static


jax.tree_util.register_pytree_node(
    SupportCtxT,
    lambda s: (tuple(s[:9]), (s.feat_dims, s.n)),
    lambda aux, ch: SupportCtxT(*ch, feat_dims=aux[0], n=aux[1]),
)


def transposed_enabled() -> bool:
    """PDR_WINDOWED_T=0 disables the transposed kernel (default on)."""
    return os.environ.get("PDR_WINDOWED_T", "1") != "0"


def build_support_ctx_auto(
    xyz: jax.Array, features: Sequence[jax.Array], max_ct: int = 128
):
    """Build the support context in whichever orientation is enabled.
    The transposed kernel needs M % 128 == 0 on every query cloud — callers
    that cannot guarantee it should pass PDR_WINDOWED_T=0 or call the
    explicit builders."""
    if transposed_enabled():
        return build_support_ctx_t(xyz, features, max_ct=max_ct)
    return build_support_ctx(xyz, features, max_ct=max_ct)


def build_support_ctx_t(
    xyz: jax.Array, features: Sequence[jax.Array], max_ct: int = 128
) -> Optional[SupportCtxT]:
    """Transposed-orientation twin of `build_support_ctx`."""
    sup = build_support_ctx(xyz, features, max_ct=max_ct)
    if sup is None:
        return None
    return SupportCtxT(
        axis_onehot=sup.axis_onehot,
        keys=sup.keys,
        planes=sup.planes,
        planes_row=jnp.swapaxes(sup.planes, 1, 2),
        table_t=jnp.swapaxes(sup.table_sorted, 1, 2),
        planes_orig=sup.planes_orig,
        planes_orig_row=jnp.swapaxes(sup.planes_orig, 1, 2),
        table_orig_t=jnp.swapaxes(sup.table_orig, 1, 2),
        row0=jnp.broadcast_to(
            sup.table_orig[:, :1, :].swapaxes(1, 2),
            (xyz.shape[0], sup.table_orig.shape[-1], 128),
        ),
        feat_dims=sup.feat_dims,
        n=sup.n,
    )


def _seg_widths(feat_dims, pos_cols, emit_idx: bool = True):
    """Per-table sublane segment widths (8-aligned so downstream channel
    slices hit aligned sublane offsets) and the per-slot total, padded so
    (B, K*out_sub, M) -> (B, K, out_sub, M) stays a pure bitcast under the
    (16, 128) bf16 tiling.  ``emit_idx=False`` drops the orig-index hi/lo
    sublanes — inference consumers never read idx, and at the FT0 shapes
    the two extra sublanes round 66 up to 80 (a 20% larger kernel write)."""
    segs = tuple(_round_up(fd + pos_cols, 8) for fd in feat_dims)
    extra = 2 if emit_idx else 0  # orig-index hi/lo sublanes
    out_sub = _round_up(sum(segs) + extra, 16)
    return segs, out_sub


def _cumsum_sub(x: jax.Array) -> jax.Array:
    """Inclusive SUBLANE-axis cumulative sum via log-shift adds."""
    n = x.shape[0]
    sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < n:
        shifted = pltpu.roll(x, s, axis=0)
        x = x + jnp.where(sub >= s, shifted, 0)
        s *= 2
    return x


def _pack_slots_t(nsample, feat_dims, segs, out_sub, include_center,
                  empty_mode, emit_idx, q, row0, mask, rank, tab, counts,
                  have, out_ref):
    """Transposed per-k gather + channel packing.

    mask/rank: (Wn, MT) over candidates; tab: (CT, Wn) bf16; q: (8, MT) f32;
    counts/have: (1, MT).  Writes each slot's (out_sub, MT) block straight
    into out_ref (16-aligned sublane offsets)."""
    rank_m = jnp.where(mask, rank, jnp.asarray(-1.0, rank.dtype))
    qpos = q[0:3, :]
    centerb = qpos.astype(jnp.bfloat16)
    g0 = None
    for k in range(nsample):
        s = jnp.where(rank_m == k, 1.0, 0.0).astype(jnp.bfloat16)  # (Wn, MT)
        g = jax.lax.dot_general(tab, s, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (CT, MT)
        if g0 is None:
            g0 = g
        else:
            g = jnp.where((k < counts), g, g0)  # repeat-first padding
        if empty_mode == "row0":
            g = jnp.where(have, g, row0.astype(jnp.float32))
        absx = g[0:3, :] + g[3:6, :]
        if empty_mode == "center_zero":
            absx = jnp.where(have, absx, qpos)
        rel = absx - qpos
        relb = rel.astype(jnp.bfloat16)
        absb = absx.astype(jnp.bfloat16)
        cols = []
        zeros1 = None
        off_t = 8
        for fd, seg in zip(feat_dims, segs):
            cols.append(g[off_t:off_t + fd, :].astype(jnp.bfloat16))
            cols.append(relb)
            cols.append(absb)
            used = fd + 6
            if include_center:
                cols.append(centerb)
                used += 3
            if used < seg:
                cols.append(jnp.zeros((seg - used, g.shape[1]), jnp.bfloat16))
            off_t += fd
        if emit_idx:
            cols.append(g[6:8, :].astype(jnp.bfloat16))  # orig idx hi/lo
        tail = out_sub - (sum(segs) + (2 if emit_idx else 0))
        if tail:
            if zeros1 is None:
                zeros1 = jnp.zeros((tail, g.shape[1]), jnp.bfloat16)
            cols.append(zeros1)
        out_ref[0, k * out_sub:(k + 1) * out_sub, :] = jnp.concatenate(
            cols, axis=0
        )


def _window_kernel_t(radius, nsample, W, W2, feat_dims, segs, out_sub,
                     include_center, empty_mode, emit_idx, starts_ref,
                     sup_ref, prow_ref, q_ref, tab_ref, sup_o_ref,
                     prow_o_ref, tab_o_ref, row0_ref, out_ref, cnt_ref):
    """Grid (B, M/MT), MT = 128 query LANES.  Same per-tile tier protocol as
    `_window_kernel` (start >= 0 narrow W; start <= -2 mid 2W; -1 wide)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    s0 = starts_ref[b, t]
    q = q_ref[0]                               # (8, MT) f32
    r2 = jnp.float32(radius * radius)

    def _mask_counts(sup_cols, MT):
        d = None
        for c in range(3):
            diff = sup_cols[:, c:c + 1] - q[c:c + 1, :]   # (Wn, MT)
            d = diff * diff if d is None else d + diff * diff
        mask = d < r2
        counts = jnp.minimum(
            jnp.sum(mask.astype(jnp.int32), axis=0, keepdims=True), nsample
        )                                      # (1, MT)
        cnt_ref[0, :, :] = jnp.broadcast_to(counts, (8, MT))
        return mask, counts

    def _sorted_tile(start, Wn):
        start = pl.multiple_of(start, 128)
        sup = sup_ref[0, pl.ds(start, Wn), :]           # (Wn, 8) f32
        tab = tab_ref[0, :, pl.ds(start, Wn)]           # (CT, Wn) bf16
        orow = prow_ref[0, 3:4, pl.ds(start, Wn)]       # (1, Wn) f32
        mask, counts = _mask_counts(sup, q.shape[1])
        have = counts > 0                               # (1, MT)
        # selection rank transposed: rank^T = L^T @ mask^T, with
        # L^T[w, w'] = [orig(w') < orig(w)]
        ocol = sup[:, 3:4]                              # (Wn, 1)
        lt = jnp.where(ocol > orow, 1.0, 0.0).astype(jnp.bfloat16)
        mb = jnp.where(mask, 1.0, 0.0).astype(jnp.bfloat16)
        rank = jax.lax.dot_general(lt, mb, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        _pack_slots_t(nsample, feat_dims, segs, out_sub, include_center,
                      empty_mode, emit_idx, q, row0_ref[0], mask, rank, tab,
                      counts, have, out_ref)

    @pl.when(s0 >= 0)
    def _narrow():
        _sorted_tile(jnp.maximum(s0, 0), W)

    if W2 > W:
        @pl.when(s0 <= -2)
        def _mid():
            _sorted_tile(jnp.maximum(-(s0 + 2), 0), W2)

    @pl.when(s0 == -1)
    def _wide():
        sup = sup_o_ref[0]                              # (Np, 8) orig order
        tab = tab_o_ref[0]                              # (CT, Np)
        mask, counts = _mask_counts(sup, q.shape[1])
        have = counts > 0
        rank = (_cumsum_sub(mask.astype(jnp.int32)) - 1).astype(jnp.float32)
        _pack_slots_t(nsample, feat_dims, segs, out_sub, include_center,
                      empty_mode, emit_idx, q, row0_ref[0], mask, rank, tab,
                      counts, have, out_ref)


@functools.partial(jax.jit, static_argnums=(9, 10, 11, 12, 13, 14, 15, 16))
def _windowed_call_t(planes, planes_row, table_t, qT8, starts, planes_orig,
                     planes_orig_row, table_orig_t, row0,
                     radius: float, nsample: int, W: int, feat_dims: tuple,
                     include_center: bool = False,
                     empty_mode: str = "center_zero",
                     interpret: bool = False, emit_idx: bool = True):
    B, Np, _ = planes.shape
    M = qT8.shape[-1]
    MT = 128
    assert M % MT == 0, (M, MT)
    CT = table_t.shape[1]
    pos_cols = 9 if include_center else 6
    segs, out_sub = _seg_widths(feat_dims, pos_cols, emit_idx)
    W2 = 2 * W if 2 * W < Np else W
    kernel = functools.partial(
        _window_kernel_t, float(radius), nsample, W, W2,
        feat_dims, segs, out_sub, include_center, empty_mode, emit_idx,
    )
    grid = (B, M // MT)
    full_spec = pl.BlockSpec((1, Np, 8), lambda b, t, s: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 8, Np), lambda b, t, s: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((1, CT, Np), lambda b, t, s: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    out, cnt = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                full_spec,
                row_spec,
                pl.BlockSpec((1, 8, MT), lambda b, t, s: (b, 0, t),
                             memory_space=pltpu.VMEM),
                table_spec,
                full_spec,
                row_spec,
                table_spec,
                pl.BlockSpec((1, CT, 128), lambda b, t, s: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, nsample * out_sub, MT),
                             lambda b, t, s: (b, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, MT), lambda b, t, s: (b, 0, t),
                             memory_space=pltpu.VMEM),
            ],
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        out_shape=[
            jax.ShapeDtypeStruct((B, nsample * out_sub, M), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, 8, M), jnp.int32),
        ],
        interpret=interpret,
    )(starts, planes, planes_row, qT8, table_t, planes_orig,
      planes_orig_row, table_orig_t, row0)
    return out, cnt[:, 0, :]


def _record_window_macs(B, M, W, nsample, CT):
    """Trace-time analytic MAC tally for MFU accounting (utils/flops.py).
    Narrow-tier lower bound: rank matmul W^2 + K gather contractions W*CT
    per query; mid/wide tiles cost more but are data-dependent."""
    from ..utils.flops import record_pallas_macs

    record_pallas_macs(float(B) * M * (float(W) * W + nsample * float(W) * CT))


def _tier_starts(sup_keys, q_keys, radius, W, Np, M, MT):
    """Host-side per-tile tier decision shared by both kernel orientations:
    returns (scal (B, Tn) i32, wide (B, Tn) bool)."""
    Tn = M // MT
    tiles = q_keys.reshape(-1, Tn, MT)
    lo = tiles.min(-1) - radius
    hi = tiles.max(-1) + radius
    # searchsorted as a broadcast compare-count: jnp.searchsorted lowers to a
    # per-element while loop on TPU (~26 us/step for the two calls at the
    # level-0 shapes); #(keys < v) over (B, N, Tn) is one fused reduce (~2 us)
    raw = jnp.sum(
        (sup_keys[:, :, None] < lo[:, None, :]).astype(jnp.int32), axis=1
    )
    ends = jnp.sum(
        (sup_keys[:, :, None] <= hi[:, None, :]).astype(jnp.int32), axis=1
    )
    a128 = ((raw // 128) * 128).astype(jnp.int32)
    starts_w = jnp.clip(a128, 0, max(Np - W, 0))
    if W >= Np:
        return starts_w, jnp.zeros(starts_w.shape, bool)
    over_w = ends > starts_w + W
    W2 = 2 * W if 2 * W < Np else W
    if W2 > W:
        starts_m = jnp.clip(a128, 0, max(Np - W2, 0))
        wide = over_w & (ends > starts_m + W2)
        scal = jnp.where(
            wide, jnp.int32(-1),
            jnp.where(over_w, -(starts_m + 2), starts_w),
        )
    else:
        wide = over_w
        scal = jnp.where(wide, jnp.int32(-1), starts_w)
    return scal, wide


def windowed_ball_group_t(
    sup: SupportCtxT,
    q: QueryCtx,
    radius: float,
    nsample: int,
    window: Optional[int] = None,
    include_center: bool = False,
    empty_mode: str = "center_zero",
    interpret: bool = False,
    emit_idx: bool = True,
) -> WindowedGroups:
    """Transposed-orientation `windowed_ball_group`: identical contract and
    values, M-minor outputs with no relayout copy."""
    B, Np, _ = sup.planes.shape
    M = q.xyz_sorted.shape[1]
    assert M % 128 == 0, M
    W = window if window is not None else default_window(sup.n)
    W = min(W, Np)
    scal, wide = _tier_starts(sup.keys, q.keys, radius, W, Np, M, 128)
    _record_window_macs(B, M, W, nsample, sup.table_orig_t.shape[1])

    qT8 = jnp.concatenate(
        [jnp.swapaxes(q.xyz_sorted, 1, 2), jnp.zeros((B, 5, M), jnp.float32)],
        axis=1,
    )  # (B, 8, M)

    out, counts = _windowed_call_t(
        sup.planes, sup.planes_row, sup.table_t, qT8, scal,
        sup.planes_orig, sup.planes_orig_row, sup.table_orig_t, sup.row0,
        float(radius), nsample, W, sup.feat_dims, include_center,
        empty_mode, interpret, emit_idx,
    )
    pos_cols = 9 if include_center else 6
    segs, out_sub = _seg_widths(sup.feat_dims, pos_cols, emit_idx)
    out4 = out.reshape(B, nsample, out_sub, M)  # bitcast (out_sub % 16 == 0)
    used = []
    off = 0
    for fd, seg in zip(sup.feat_dims, segs):
        # (B, K, C, M) -> logical (B, M, K, C); physically M-minor already,
        # so XLA assigns the {1,3,2,0} layout and the transpose is free
        used.append(
            jnp.transpose(out4[:, :, off:off + fd + pos_cols, :], (0, 3, 1, 2))
        )
        off += seg
    idx = None
    if emit_idx:
        ihi = out4[:, :, sum(segs), :].astype(jnp.int32)  # (B, K, M)
        ilo = out4[:, :, sum(segs) + 1, :].astype(jnp.int32)
        idx = jnp.transpose(ihi * 128 + ilo, (0, 2, 1))
    return WindowedGroups(
        grouped=tuple(used), counts=counts, idx=idx,
        fell_back=jnp.any(wide),
    )


# ---------------------------------------------------------------------------
# Windowed fused kNN + gather (the KnnFP hot pair)
# ---------------------------------------------------------------------------
#
# group_knn_features (models/grouping.py:188, reference group_knn
# pointnet2_utils.py:487-514) runs an exact kNN kernel and then a one-hot
# MXU gather whose contraction spans the FULL support cloud.  At the FP-0
# shapes (2048 queries x 1024 support, K=8, C~155) the pair costs ~0.35 ms
# per step on v5e.  This kernel fuses both over the sorted support: the
# iterative-min selection scans only a W-wide window, and each selection's
# one-hot row feeds the per-k MXU gather directly, so the contraction is W
# wide instead of Np.
#
# kNN has no a-priori radius, so window sufficiency cannot be decided
# host-side.  Each tile first runs the narrow selection, then checks the
# k-th neighbor distance against the window-edge keys (|key_q - key_s| is
# a lower bound on the Euclidean distance, so d_k < min-edge-key-gap^2
# proves no outside point belongs to the k nearest); tiles that fail the
# check rerun selection over the full support in ORIGINAL index order
# under pl.when, exactly like the ball-query wide mode.  Results are exact
# (up to distance ties and the bf16 rounding of the emitted channels).


def _knn_select(k, d, tie_col, tie_cap):
    """Iterative-min k-NN over the lane axis with lowest-`tie_col` ties.

    Returns ([k] of (MT,) f32 sq-dists ascending, [k] of (MT, W) bool
    one-hot selections)."""
    big = jnp.float32(3.4e38)
    remaining = jnp.ones(d.shape, jnp.bool_)
    vals, sels = [], []
    for _ in range(k):
        cand = jnp.where(remaining, d, big)
        val = jnp.min(cand, axis=1)
        hit = cand == val[:, None]
        o = jnp.min(jnp.where(hit, tie_col, tie_cap), axis=1)
        sel = hit & (tie_col == o[:, None])
        vals.append(val)
        sels.append(sel)
        remaining = remaining & ~sel
    return vals, sels


def _knn_pack(k, feat_dims, out_cols, qT, vals, sels, tab):
    """Per-k gather + channel packing in group_knn_features order:
    [feats, sq_dist, inv-dist weight, abs_xyz, rel_xyz, center_xyz]."""
    MT = qT.shape[0]
    recips = [1.0 / (v + 1e-8) for v in vals]
    wsum = recips[0]
    for r in recips[1:]:
        wsum = wsum + r
    centerb = qT[:, :3].astype(jnp.bfloat16)
    zeros_pad = None
    pieces = []
    for j in range(k):
        s = jnp.where(sels[j], 1.0, 0.0).astype(jnp.bfloat16)
        g = jax.lax.dot_general(s, tab, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (MT, CT)
        absx = g[:, 0:3] + g[:, 3:6]
        rel = absx - qT[:, :3]
        cols = []
        off = 8
        for fd in feat_dims:
            cols.append(g[:, off:off + fd].astype(jnp.bfloat16))
            off += fd
        cols.append(vals[j][:, None].astype(jnp.bfloat16))
        cols.append((recips[j] / wsum)[:, None].astype(jnp.bfloat16))
        cols.append(absx.astype(jnp.bfloat16))
        cols.append(rel.astype(jnp.bfloat16))
        cols.append(centerb)
        used = sum(feat_dims) + 11
        if used < out_cols:
            if zeros_pad is None:
                zeros_pad = jnp.zeros((MT, out_cols - used), jnp.bfloat16)
            cols.append(zeros_pad)
        pieces.append(jnp.concatenate(cols, axis=1))
    return jnp.concatenate(pieces, axis=1)  # (MT, k*out_cols)


def _knn_window_kernel(k, W, feat_dims, out_cols, n_valid, starts_ref,
                       sup_ref, q_ref, tab_ref, sup_o_ref, tab_o_ref,
                       out_ref):
    b = pl.program_id(0)
    t = pl.program_id(1)
    qT = q_ref[0]                              # (MT, 8): x, y, z, key, 0...
    start = pl.multiple_of(starts_ref[b, t], 128)
    sup = sup_ref[0, pl.ds(start, W), :]       # (W, 8) sorted rows
    tab = tab_ref[0, pl.ds(start, W), :]       # (W, CT) bf16
    supT = jnp.transpose(sup)
    d = None
    for c in range(3):
        diff = qT[:, c][:, None] - supT[c, :][None, :]  # (MT, W)
        d = diff * diff if d is None else d + diff * diff
    vals, sels = _knn_select(k, d, supT[3, :][None, :], jnp.float32(2.0e6))

    # window sufficiency: the k-th neighbor must beat the key-gap to both
    # window edges (edges at the array bounds are vacuously sufficient)
    dk = vals[-1]                              # (MT,)
    qk = qT[:, 3]
    lgap = qk - sup[0, 4]
    rgap = sup[W - 1, 4] - qk
    ok_l = (start == 0) | (dk < lgap * lgap)
    ok_r = (start + W >= n_valid) | (dk < rgap * rgap)
    valid = jnp.all(ok_l & ok_r)

    @pl.when(valid)
    def _narrow():
        out_ref[0, :, :] = _knn_pack(k, feat_dims, out_cols, qT, vals, sels,
                                     tab)

    @pl.when(jnp.logical_not(valid))
    def _wide():
        sup_o = sup_o_ref[0]                   # (Np, 8) original order
        tab_o = tab_o_ref[0]
        supT_o = jnp.transpose(sup_o)
        dw = None
        for c in range(3):
            diff = qT[:, c][:, None] - supT_o[c, :][None, :]
            dw = diff * diff if dw is None else dw + diff * diff
        # Mosaic only lowers integer iota; cast for the f32 tie-break column
        lane = jax.lax.broadcasted_iota(jnp.int32, dw.shape, 1).astype(
            jnp.float32
        )
        Np = dw.shape[1]
        vw, sw = _knn_select(k, dw, lane, jnp.float32(Np))
        out_ref[0, :, :] = _knn_pack(k, feat_dims, out_cols, qT, vw, sw,
                                     tab_o)


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9))
def _knn_windowed_call(planes, table_sorted, q_sorted8, starts, planes_orig,
                       table_orig, k: int, W: int, feat_dims: tuple,
                       interpret: bool = False):
    B, Np, _ = planes.shape
    M = q_sorted8.shape[-2]
    MT = _row_tile(M)
    assert M % MT == 0, (M, MT)
    CT = table_sorted.shape[-1]
    out_cols = _round_up(sum(feat_dims) + 11, 128)
    kernel = functools.partial(
        _knn_window_kernel, k, W, feat_dims, out_cols, Np,
    )
    grid = (B, M // MT)
    full_spec = pl.BlockSpec((1, Np, 8), lambda b, t, s: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((1, Np, CT), lambda b, t, s: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                full_spec,
                pl.BlockSpec((1, MT, 8), lambda b, t, s: (b, t, 0),
                             memory_space=pltpu.VMEM),
                table_spec,
                full_spec,
                table_spec,
            ],
            out_specs=pl.BlockSpec((1, MT, k * out_cols),
                                   lambda b, t, s: (b, t, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        out_shape=jax.ShapeDtypeStruct((B, M, k * out_cols), jnp.bfloat16),
        interpret=interpret,
    )(starts, planes, q_sorted8, table_sorted, planes_orig, table_orig)
    return out.reshape(B, M, k, out_cols)


def windowed_knn_group(
    sup: SupportCtx,
    q: QueryCtx,
    k: int,
    window: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused windowed kNN + gather in group_knn_features channel order.

    Returns (B, M, k, C + 11) bf16 in *sorted-query* order: [neighbor
    feats, squared dist, inverse-distance weight, abs pos, rel pos, query
    pos].  Exact up to distance ties and bf16 rounding of the emitted
    channels (matching the lossy_features gather path).

    A SupportCtxT routes to the transposed kernel (same values, M-minor
    output).
    """
    if isinstance(sup, SupportCtxT):
        if q.xyz_sorted.shape[1] % 128 != 0:
            raise ValueError(
                "windowed_knn_group: SupportCtxT (transposed kernel) needs "
                f"query count % 128 == 0, got {q.xyz_sorted.shape[1]}"
            )
        return windowed_knn_group_t(
            sup, q, k, window=window, interpret=interpret
        )
    B, Np, _ = sup.planes.shape
    M = q.xyz_sorted.shape[1]
    if window is None:
        env = os.environ.get("PDR_KNN_W")
        window = int(env) if env else None
    W = window if window is not None else default_window(sup.n)
    W = min(W, Np)
    assert W >= k + 128, (W, k)  # window must outsize the pad tail + k
    MT = _row_tile(M)
    assert M % MT == 0, (M, MT)
    Tn = M // MT

    # center each tile's window on its median key position
    tiles = q.keys.reshape(B, Tn, MT)
    mid = 0.5 * (tiles.min(-1) + tiles.max(-1))
    # searchsorted as a broadcast compare-count (see _tier_starts)
    pos = jnp.sum(
        (sup.keys[:, :, None] < mid[:, None, :]).astype(jnp.int32), axis=1
    )
    starts = jnp.clip(
        ((pos.astype(jnp.int32) - W // 2) // 128) * 128, 0, max(Np - W, 0)
    )

    q8 = jnp.concatenate(
        [q.xyz_sorted, q.keys[:, :, None],
         jnp.zeros((B, M, 4), jnp.float32)], axis=-1
    )  # (B, M, 8)

    # selection is iterative-min VPU work; only the per-k gather
    # contractions (W x CT per slot) ride the MXU — no rank matmul
    from ..utils.flops import record_pallas_macs

    record_pallas_macs(
        float(B) * M * k * float(W) * sup.table_orig.shape[-1]
    )
    out = _knn_windowed_call(
        sup.planes, sup.table_sorted, q8, starts, sup.planes_orig,
        sup.table_orig, k, W, sup.feat_dims, interpret,
    )
    return out[..., : sum(sup.feat_dims) + 11]


# ---------------------------------------------------------------------------
# Transposed windowed kNN + gather (queries on LANES)
# ---------------------------------------------------------------------------
#
# The kNN kernel above shares the weakness the transposed BALL kernel fixed
# (see the comment block before SupportCtxT): its per-slot gathers pay the
# MXU for out_cols = round_up(C+11, 128) lanes (256 at the kNN-FP level-0
# widths, 1.5x the payload) and its (B, M, K, C) outputs force M-minor
# relayout copies at the pallas boundary.  This twin puts queries on the
# lane axis end to end: distances/selection are (W, MT) with candidates on
# sublanes, each gather is tab (CT, W) x onehot (W, MT), and the output
# block is (K*out_sub, MT) — M-minor, the layout XLA already wants.
# Values match `windowed_knn_group` / `group_knn_features` exactly up to
# distance ties (resolved identically: lowest original index) and bf16
# channel rounding.


def _knn_select_t(k, d, tie_col, tie_cap):
    """Iterative-min k-NN over the SUBLANE axis with lowest-`tie_col` ties.

    d: (W, MT); tie_col: (W, 1).  Returns ([k] of (1, MT) f32 sq-dists
    ascending, [k] of (W, MT) bool one-hot selections)."""
    big = jnp.float32(3.4e38)
    remaining = jnp.ones(d.shape, jnp.bool_)
    vals, sels = [], []
    for _ in range(k):
        cand = jnp.where(remaining, d, big)
        val = jnp.min(cand, axis=0, keepdims=True)  # (1, MT)
        hit = cand == val
        o = jnp.min(jnp.where(hit, tie_col, tie_cap), axis=0, keepdims=True)
        sel = hit & (tie_col == o)
        vals.append(val)
        sels.append(sel)
        remaining = remaining & ~sel
    return vals, sels


def _knn_pack_t(k, feat_dims, out_sub, q, vals, sels, tab, out_ref):
    """Transposed per-slot gather + packing in group_knn_features row order:
    [feats, sq_dist, inv-dist weight, abs_xyz, rel_xyz, center_xyz]."""
    recips = [1.0 / (v + 1e-8) for v in vals]
    wsum = recips[0]
    for r in recips[1:]:
        wsum = wsum + r
    qpos = q[0:3, :]
    centerb = qpos.astype(jnp.bfloat16)
    fd = sum(feat_dims)
    for j in range(k):
        s = jnp.where(sels[j], 1.0, 0.0).astype(jnp.bfloat16)  # (W, MT)
        g = jax.lax.dot_general(tab, s, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (CT, MT)
        absx = g[0:3, :] + g[3:6, :]
        rel = absx - qpos
        rows = [
            g[8:8 + fd, :].astype(jnp.bfloat16),
            vals[j].astype(jnp.bfloat16),
            (recips[j] / wsum).astype(jnp.bfloat16),
            absx.astype(jnp.bfloat16),
            rel.astype(jnp.bfloat16),
            centerb,
        ]
        used = fd + 11
        if used < out_sub:
            rows.append(jnp.zeros((out_sub - used, g.shape[1]), jnp.bfloat16))
        out_ref[0, j * out_sub:(j + 1) * out_sub, :] = jnp.concatenate(
            rows, axis=0
        )


def _knn_window_kernel_t(k, W, feat_dims, out_sub, n_valid, starts_ref,
                         sup_ref, q_ref, tab_ref, sup_o_ref, tab_o_ref,
                         out_ref):
    b = pl.program_id(0)
    t = pl.program_id(1)
    q = q_ref[0]                                # (8, MT): x, y, z, key, 0...
    start = pl.multiple_of(starts_ref[b, t], 128)
    sup = sup_ref[0, pl.ds(start, W), :]        # (W, 8) sorted rows
    tab = tab_ref[0, :, pl.ds(start, W)]        # (CT, W) bf16
    d = None
    for c in range(3):
        diff = sup[:, c:c + 1] - q[c:c + 1, :]  # (W, MT)
        d = diff * diff if d is None else d + diff * diff
    vals, sels = _knn_select_t(k, d, sup[:, 3:4], jnp.float32(2.0e6))

    # window sufficiency: the k-th neighbor must beat the key-gap to both
    # window edges (bounds at the array edges are vacuously sufficient)
    dk = vals[-1]                               # (1, MT)
    qk = q[3:4, :]
    lgap = qk - sup[0, 4]
    rgap = sup[W - 1, 4] - qk
    ok_l = (start == 0) | (dk < lgap * lgap)
    ok_r = (start + W >= n_valid) | (dk < rgap * rgap)
    valid = jnp.all(ok_l & ok_r)

    @pl.when(valid)
    def _narrow():
        _knn_pack_t(k, feat_dims, out_sub, q, vals, sels, tab, out_ref)

    @pl.when(jnp.logical_not(valid))
    def _wide():
        sup_o = sup_o_ref[0]                    # (Np, 8) original order
        tab_o = tab_o_ref[0]                    # (CT, Np)
        dw = None
        for c in range(3):
            diff = sup_o[:, c:c + 1] - q[c:c + 1, :]
            dw = diff * diff if dw is None else dw + diff * diff
        Np = dw.shape[0]
        sub = jax.lax.broadcasted_iota(jnp.int32, (Np, 1), 0).astype(
            jnp.float32
        )
        vw, sw = _knn_select_t(k, dw, sub, jnp.float32(Np))
        _knn_pack_t(k, feat_dims, out_sub, q, vw, sw, tab_o, out_ref)


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10))
def _knn_windowed_call_t(planes, table_t, qT8, starts, planes_orig,
                         table_orig_t, k: int, W: int, feat_dims: tuple,
                         out_sub: int, interpret: bool = False):
    B, Np, _ = planes.shape
    M = qT8.shape[-1]
    MT = 128
    assert M % MT == 0, (M, MT)
    CT = table_t.shape[1]
    kernel = functools.partial(
        _knn_window_kernel_t, k, W, feat_dims, out_sub, Np,
    )
    grid = (B, M // MT)
    full_spec = pl.BlockSpec((1, Np, 8), lambda b, t, s: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((1, CT, Np), lambda b, t, s: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                full_spec,
                pl.BlockSpec((1, 8, MT), lambda b, t, s: (b, 0, t),
                             memory_space=pltpu.VMEM),
                table_spec,
                full_spec,
                table_spec,
            ],
            out_specs=pl.BlockSpec((1, k * out_sub, MT),
                                   lambda b, t, s: (b, 0, t),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        out_shape=jax.ShapeDtypeStruct((B, k * out_sub, M), jnp.bfloat16),
        interpret=interpret,
    )(starts, planes, qT8, table_t, planes_orig, table_orig_t)
    return out


def windowed_knn_group_t(
    sup: SupportCtxT,
    q: QueryCtx,
    k: int,
    window: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Transposed-orientation `windowed_knn_group`: identical contract and
    values, M-minor output with no relayout copy and no 128-lane padding of
    the per-slot gathers."""
    B, Np, _ = sup.planes.shape
    M = q.xyz_sorted.shape[1]
    assert M % 128 == 0, M
    if window is None:
        env = os.environ.get("PDR_KNN_W")
        window = int(env) if env else None
    W = window if window is not None else default_window(sup.n)
    W = min(W, Np)
    assert W >= k + 128, (W, k)
    Tn = M // 128

    # center each tile's window on its median key position
    tiles = q.keys.reshape(B, Tn, 128)
    mid = 0.5 * (tiles.min(-1) + tiles.max(-1))
    pos = jnp.sum(
        (sup.keys[:, :, None] < mid[:, None, :]).astype(jnp.int32), axis=1
    )
    starts = jnp.clip(
        ((pos.astype(jnp.int32) - W // 2) // 128) * 128, 0, max(Np - W, 0)
    )

    qT8 = jnp.concatenate(
        [
            jnp.swapaxes(q.xyz_sorted, 1, 2),
            q.keys[:, None, :],
            jnp.zeros((B, 4, M), jnp.float32),
        ],
        axis=1,
    )  # (B, 8, M)

    fd = sum(sup.feat_dims)
    out_sub = _round_up(fd + 11, 16)
    from ..utils.flops import record_pallas_macs

    record_pallas_macs(
        float(B) * M * k * float(W) * sup.table_orig_t.shape[1]
    )
    out = _knn_windowed_call_t(
        sup.planes, sup.table_t, qT8, starts, sup.planes_orig,
        sup.table_orig_t, k, W, sup.feat_dims, out_sub, interpret,
    )
    out4 = out.reshape(B, k, out_sub, M)  # bitcast (out_sub % 16 == 0)
    # (B, K, C, M) -> logical (B, M, K, C); physically M-minor already
    return jnp.transpose(out4[:, :, : fd + 11, :], (0, 3, 1, 2))
