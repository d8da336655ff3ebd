"""Furthest point sampling as a single Pallas TPU kernel.

The XLA `lax.fori_loop` version (ops/sampling.py) executes several small
kernels per iteration; at npoint=1024 the per-iteration launch overhead
dominates (~6us/iter measured on v5e).  This kernel runs the whole selection
loop on-core with the running min-distance matrix resident in VMEM:

  * xyz is laid out (3, B, N): coordinate planes on the leading axis so each
    (B, N) slab has batch on sublanes and points on lanes — every iteration
    is a handful of fused (B, N) VPU passes;
  * the selected point is extracted with a one-hot masked max (no per-row
    dynamic gather);
  * the argmax uses a max-reduce + index-match-min, all on the VPU.

Semantics identical to sampling_gpu.cu:69-173 / ops.sampling.furthest_point_sample:
idx[0] = 0, padding points (|p|^2 <= 1e-3) never selected, maximize running
min-distance.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sampling import PAD_NORM_SQ


def _fps_kernel_stacked(npoint: int, xyz_ref, idx_ref, mind_ref):
    # Variant of _fps_kernel that extracts the selected point's coordinates
    # with ONE masked max over a (3B, N) sublane-stacked slab instead of
    # three over (B, N).  At small B the three (B, N) reduces underfill the
    # 8-sublane vregs; stacking packs them 3x denser, cutting the
    # per-iteration extraction from ~3 full reduces to ~1.  Semantics are
    # bit-identical (the one-hot extraction is exact either way).
    _, B, N = xyz_ref.shape
    x = xyz_ref[0]  # (B, N)
    y = xyz_ref[1]
    z = xyz_ref[2]
    slab = jnp.concatenate([x, y, z], axis=0)  # (3B, N) — once, outside loop
    valid = (x * x + y * y + z * z) > PAD_NORM_SQ  # (B, N)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (3 * B, N), 1)

    mind_ref[:, :] = jnp.where(valid, jnp.float32(1e10), jnp.float32(-1.0))
    idx_ref[0, :] = jnp.zeros((B,), jnp.int32)

    def body(j, old):
        old3 = jnp.concatenate([old, old, old])  # (3B,)
        onehot3 = lane3 == old3[:, None]  # (3B, N)
        neg_inf = jnp.float32(-1e30)
        sel3 = jnp.max(jnp.where(onehot3, slab, neg_inf), axis=1)  # (3B,)
        sel_x = jax.lax.slice_in_dim(sel3, 0, B)
        sel_y = jax.lax.slice_in_dim(sel3, B, 2 * B)
        sel_z = jax.lax.slice_in_dim(sel3, 2 * B, 3 * B)
        dx = x - sel_x[:, None]
        dy = y - sel_y[:, None]
        dz = z - sel_z[:, None]
        d = dx * dx + dy * dy + dz * dz
        cand = jnp.minimum(mind_ref[:, :], d)
        mind_ref[:, :] = cand
        best = jnp.max(cand, axis=1)  # (B,)
        hit = cand == best[:, None]
        new = jnp.min(jnp.where(hit, lane, N), axis=1).astype(jnp.int32)
        idx_ref[pl.ds(j, 1), :] = new[None, :]
        return new

    jax.lax.fori_loop(1, npoint, body, jnp.zeros((B,), jnp.int32))


def _fps_kernel_folded(npoint: int, fold: int, xyz_ref, idx_ref, mind_ref):
    """`_fps_kernel` with each batch row's N lanes folded across `fold`
    sublane copies: (B, N) -> (B*fold, N/fold), rows h*B..h*B+B-1 holding
    lane span [h*Nh, (h+1)*Nh).  At B < 8 the unfolded kernel leaves most
    of every vreg's 8 sublanes idle; folding packs them, halving (fold=2)
    the VPU passes of every per-iteration sweep.  Cross-fold combines are
    a log2(fold) butterfly of cyclic row-shifts on tiny (B*fold,) lane
    vectors.  The fold happens IN-KERNEL on values (a one-time lane
    re-slice in VMEM) and the idx output stays (npoint, B) — the XLA-side
    (3,B,N)->(3,2B,N/2) relayout and strided idx slice that sank the
    round-2 attempt (STATUS.md) never exist.  Selection semantics are
    bit-identical: global lane index = row_half*Nh + lane, ties still
    resolve to the lowest global index."""
    _, B, N = xyz_ref.shape
    F = B * fold
    Nh = N // fold

    def fold_rows(plane):  # (B, N) -> (F, Nh)
        return jnp.concatenate(
            [
                jax.lax.slice_in_dim(plane, h * Nh, (h + 1) * Nh, axis=1)
                for h in range(fold)
            ],
            axis=0,
        )

    x = fold_rows(xyz_ref[0])
    y = fold_rows(xyz_ref[1])
    z = fold_rows(xyz_ref[2])
    valid = (x * x + y * y + z * z) > PAD_NORM_SQ  # (F, Nh)
    lane = jax.lax.broadcasted_iota(jnp.int32, (F, Nh), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (F, Nh), 0)
    offs = (row // B) * Nh          # per-row global-lane offset
    glane = lane + offs             # global point index of each slot

    neg_inf = jnp.float32(-1e30)

    def fold_max_combine(cols):
        # elementwise-max butterfly over the fold copies of each row: `cols`
        # is a tiny (F, k) column pack (ONE vreg), each exchange one sublane
        # roll + max.  (Mosaic has no 1-D vector ops; rolling the (F, Nh)
        # arrays would cost whole extra passes.)
        s = B
        while s < F:
            cols = jnp.maximum(cols, pltpu.roll(cols, F - s, axis=0))
            s *= 2
        return cols

    def local_select(cand):
        """Per-FOLD-ROW argmax of cand with lowest-global-index tie-break,
        plus the coordinates at that slot.  Everything is row-local ((F,)
        reduces + lane-vector broadcasts, the forms the unfolded kernel
        measured fastest) — the cross-fold resolution happens afterwards in
        ONE lexicographic butterfly, so each iteration pays a single
        roll-combine latency instead of three serialized ones (three
        combines measured 0.67 us/iter vs 0.42 unfolded)."""
        val = jnp.max(cand, axis=1)  # (F,)
        hit = cand == val[:, None]
        lidx = jnp.min(jnp.where(hit, glane, N), axis=1).astype(jnp.int32)
        oh = glane == lidx[:, None]
        lx = jnp.max(jnp.where(oh, x, neg_inf), axis=1)
        ly = jnp.max(jnp.where(oh, y, neg_inf), axis=1)
        lz = jnp.max(jnp.where(oh, z, neg_inf), axis=1)
        return jnp.concatenate(
            [
                val[:, None],
                lidx.astype(jnp.float32)[:, None],  # exact: idx < 2^24
                lx[:, None], ly[:, None], lz[:, None],
            ],
            axis=1,
        )  # (F, 5)

    def lex_combine(pack):
        # cross-fold argmax by (value desc, index asc): one roll per stage
        s = B
        while s < F:
            r = pltpu.roll(pack, F - s, axis=0)
            take = (r[:, 0:1] > pack[:, 0:1]) | (
                (r[:, 0:1] == pack[:, 0:1]) & (r[:, 1:2] < pack[:, 1:2])
            )
            pack = jnp.where(take, r, pack)
            s *= 2
        return pack

    mind_ref[:, :] = jnp.where(valid, jnp.float32(1e10), jnp.float32(-1.0))
    idx_ref[0, :] = jnp.zeros((B,), jnp.int32)

    # selection 0 is global index 0: extract its coordinates (owner fold row
    # holds them, others -inf; elementwise-max butterfly resolves)
    oh0 = glane == 0
    pack0 = fold_max_combine(
        jnp.concatenate(
            [
                jnp.zeros((F, 2), jnp.float32),
                jnp.max(jnp.where(oh0, x, neg_inf), axis=1)[:, None],
                jnp.max(jnp.where(oh0, y, neg_inf), axis=1)[:, None],
                jnp.max(jnp.where(oh0, z, neg_inf), axis=1)[:, None],
            ],
            axis=1,
        )
    )

    def body(j, pack):
        # pack: (F, 5) fold-combined [val, idx, sel_x, sel_y, sel_z] of the
        # previous selection
        sel_x = jnp.max(pack[:, 2:3], axis=1)  # (F,) lane vectors
        sel_y = jnp.max(pack[:, 3:4], axis=1)
        sel_z = jnp.max(pack[:, 4:5], axis=1)
        dx = x - sel_x[:, None]
        dy = y - sel_y[:, None]
        dz = z - sel_z[:, None]
        d = dx * dx + dy * dy + dz * dz
        cand = jnp.minimum(mind_ref[:, :], d)
        mind_ref[:, :] = cand
        new_pack = lex_combine(local_select(cand))
        new = jnp.min(new_pack[:, 1:2], axis=1).astype(jnp.int32)  # (F,)
        idx_ref[pl.ds(j, 1), :] = jax.lax.slice_in_dim(new, 0, B)[None, :]
        return new_pack

    jax.lax.fori_loop(1, npoint, body, pack0)


def _fps_kernel_coords(npoint: int, xyz_ref, idx_ref, coords_ref, mind_ref):
    """`_fps_kernel` additionally emitting the selected coordinates.

    The kernel already extracts the previous selection's (x, y, z) every
    iteration to compute distances (one-hot masked maxes) — storing that
    (1, 3B) row into coords_ref makes the caller's follow-up
    `gather_points(xyz, idx)` (an XLA kLoop gather, ~27 us at the SA-0
    shapes) disappear, and the emitted positions are bit-exact f32.
    coords_ref: (npoint, 3B) with row j = [x_j | y_j | z_j] per batch row;
    row j is written at iteration j+1 (when selection j's coordinates are
    extracted), with a final extraction after the loop for the last row.
    """
    _, B, N = xyz_ref.shape
    x = xyz_ref[0]  # (B, N)
    y = xyz_ref[1]
    z = xyz_ref[2]
    valid = (x * x + y * y + z * z) > PAD_NORM_SQ  # (B, N)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)

    mind_ref[:, :] = jnp.where(valid, jnp.float32(1e10), jnp.float32(-1.0))
    idx_ref[0, :] = jnp.zeros((B,), jnp.int32)

    neg_inf = jnp.float32(-1e30)

    def extract(old):
        onehot = lane == old[:, None]  # (B, N)
        sel_x = jnp.max(jnp.where(onehot, x, neg_inf), axis=1)  # (B,)
        sel_y = jnp.max(jnp.where(onehot, y, neg_inf), axis=1)
        sel_z = jnp.max(jnp.where(onehot, z, neg_inf), axis=1)
        return sel_x, sel_y, sel_z

    def body(j, old):
        sel_x, sel_y, sel_z = extract(old)
        coords_ref[pl.ds(j - 1, 1), :] = jnp.concatenate(
            [sel_x, sel_y, sel_z]
        )[None, :]
        dx = x - sel_x[:, None]
        dy = y - sel_y[:, None]
        dz = z - sel_z[:, None]
        d = dx * dx + dy * dy + dz * dz
        cand = jnp.minimum(mind_ref[:, :], d)
        mind_ref[:, :] = cand
        best = jnp.max(cand, axis=1)  # (B,)
        hit = cand == best[:, None]
        new = jnp.min(jnp.where(hit, lane, N), axis=1).astype(jnp.int32)
        idx_ref[pl.ds(j, 1), :] = new[None, :]
        return new

    last = jax.lax.fori_loop(1, npoint, body, jnp.zeros((B,), jnp.int32))
    lx, ly, lz = extract(last)
    coords_ref[pl.ds(npoint - 1, 1), :] = jnp.concatenate([lx, ly, lz])[None, :]


def _fps_kernel(npoint: int, xyz_ref, idx_ref, mind_ref):
    # xyz_ref: (3, B, N) f32; idx_ref: (npoint, B) i32 (row-major per
    # iteration so the dynamic store is a full (1, B) sublane row — Mosaic
    # cannot prove dynamic LANE indices 128-aligned); mind_ref: (B, N)
    _, B, N = xyz_ref.shape
    x = xyz_ref[0]  # (B, N)
    y = xyz_ref[1]
    z = xyz_ref[2]
    valid = (x * x + y * y + z * z) > PAD_NORM_SQ  # (B, N)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)

    # Padding points carry a -1.0 sentinel in the running min-distance
    # array: squared distances are >= 0, so `minimum` preserves it forever
    # and the per-iteration `where(valid, mind, -1)` masking pass vanishes
    # — the candidate array IS the min-distance array.  Argmax semantics
    # are bit-identical to the XLA reference (valid entries are >= 0; an
    # all-padding row yields best == -1.0 -> lowest lane, i.e. index 0).
    mind_ref[:, :] = jnp.where(valid, jnp.float32(1e10), jnp.float32(-1.0))
    idx_ref[0, :] = jnp.zeros((B,), jnp.int32)

    def body(j, old):
        # old: (B,) int32 — most recently selected index per row.  ((B, 1)
        # keepdims columns measured 26% SLOWER on v5e: Mosaic's (B,) lane
        # vectors broadcast cheaper than sublane columns here.)
        onehot = lane == old[:, None]  # (B, N)
        neg_inf = jnp.float32(-1e30)
        sel_x = jnp.max(jnp.where(onehot, x, neg_inf), axis=1)  # (B,)
        sel_y = jnp.max(jnp.where(onehot, y, neg_inf), axis=1)
        sel_z = jnp.max(jnp.where(onehot, z, neg_inf), axis=1)
        dx = x - sel_x[:, None]
        dy = y - sel_y[:, None]
        dz = z - sel_z[:, None]
        d = dx * dx + dy * dy + dz * dz
        cand = jnp.minimum(mind_ref[:, :], d)
        mind_ref[:, :] = cand
        best = jnp.max(cand, axis=1)  # (B,)
        # first index attaining the max (ties -> lowest index, like argmax)
        hit = cand == best[:, None]
        new = jnp.min(jnp.where(hit, lane, N), axis=1).astype(jnp.int32)
        idx_ref[pl.ds(j, 1), :] = new[None, :]
        return new

    jax.lax.fori_loop(1, npoint, body, jnp.zeros((B,), jnp.int32))


# Per-grid-step VMEM budget for the working set (bytes).  The kernel's live
# set is ~8 (Bt, N) f32 planes (xyz x3, running min, distance, candidate,
# one-hot/iota temporaries); cap it well under the ~16 MB/core VMEM.  The
# stacked variant additionally keeps a (3Bt, N) slab plus same-shaped
# onehot/masked temporaries live (~6 extra planes).
_FPS_VMEM_BUDGET = 8 * 2 ** 20
_FPS_PLANES = 8
_FPS_PLANES_STACKED = 14


def fps_batch_tile(B: int, N: int, stacked: bool = False) -> int:
    """Largest batch tile whose (Bt, N) working set fits the VMEM budget."""
    planes = _FPS_PLANES_STACKED if stacked else _FPS_PLANES
    per_row = N * 4 * planes
    return max(1, min(B, _FPS_VMEM_BUDGET // per_row))


def furthest_point_sample_pallas(
    xyz: jax.Array, npoint: int, interpret: bool = False
) -> jax.Array:
    """Drop-in Pallas replacement for ops.furthest_point_sample.

    The batch is split into VMEM-sized chunks at the JAX level (one
    pallas_call per chunk, all sharing one compiled kernel) so the working
    set fits VMEM at any B — refine+upsample runs B=64 / N=16384.  A grid
    inside one pallas_call is not usable here: the (npoint, Bt) output block
    would need a 128-divisible trailing dim, and the transposed layout would
    need dynamic lane-axis stores Mosaic rejects.

    Args:
      xyz: (B, N, 3) positions.
    Returns:
      (B, npoint) int32 indices.
    """
    return _fps_pallas_impl(xyz, npoint, interpret, _FPS_STACKED)


# Read once at import: the flag selects a traced code path, so a call-time
# read would be captured at first trace and later toggles would silently
# no-op inside an outer jit (advisor r2).
_FPS_STACKED = os.environ.get("PDR_FPS_STACKED", "0") != "0"


def furthest_point_sample_pallas_coords(
    xyz: jax.Array, npoint: int, interpret: bool = False
):
    """FPS returning (idx (B, npoint) i32, coords (B, npoint, 3) f32) from
    one kernel — the coordinates the selection loop extracts anyway, emitted
    so the caller's `gather_points(xyz, idx)` disappears.  Bit-exact f32."""
    return _fps_pallas_coords_impl(xyz, npoint, interpret)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _fps_pallas_coords_impl(xyz: jax.Array, npoint: int, interpret: bool):
    B, N, _ = xyz.shape
    Bt = min(B, fps_batch_tile(B, N))

    def run_chunk(planes_chunk):
        bc = planes_chunk.shape[1]
        return pl.pallas_call(
            functools.partial(_fps_kernel_coords, npoint),
            out_shape=[
                jax.ShapeDtypeStruct((npoint, bc), jnp.int32),
                jax.ShapeDtypeStruct((npoint, 3 * bc), jnp.float32),
            ],
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((bc, N), jnp.float32)],
            interpret=interpret,
        )(planes_chunk)

    planes = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))  # (3, B, N)
    idxs, coords = [], []
    for i in range(0, B, Bt):
        chunk = planes[:, i : i + Bt]
        bc = chunk.shape[1]
        if bc != Bt and B > Bt:
            chunk = jnp.pad(chunk, ((0, 0), (0, Bt - bc), (0, 0)))
        idx_c, co_c = run_chunk(chunk)
        idxs.append(idx_c.T)
        # (npoint, 3*Bt) rows = [x | y | z] -> (Bt, npoint, 3)
        co = co_c.reshape(npoint, 3, chunk.shape[1])
        coords.append(jnp.transpose(co, (2, 0, 1)))
    idx = jnp.concatenate(idxs, axis=0) if len(idxs) > 1 else idxs[0]
    co = jnp.concatenate(coords, axis=0) if len(coords) > 1 else coords[0]
    return idx[:B], co[:B]


def _fps_fold(B: int, N: int) -> int:
    """Largest sublane fold: B*fold <= 8 with a 128-multiple folded lane
    span (Mosaic lane slices of the fold are then tile-aligned).

    OPT-IN (PDR_FPS_FOLD=1) — measured NEGATIVE on v5e at the shipped
    shapes: the per-iteration cost is ~85% fixed latency (loop control +
    reduce chain + dynamic idx store: 0.37 us/iter at (4,1024) vs 0.42 at
    (4,2048) on the unfolded kernel), so halving the vector passes saves
    almost nothing and the cross-fold combine adds to the dependency chain
    (3-combine variant 0.67 us/iter, single lex-combine 0.63).  Kept
    bit-parity-tested for future large-N/smaller-B shapes where vector
    work dominates."""
    if not _FPS_FOLD_ENABLED:
        return 1
    fold = 1
    while B * fold * 2 <= 8 and N % (fold * 2 * 128) == 0:
        fold *= 2
    return fold


# read at import like _FPS_STACKED (call-time reads are trace-captured)
_FPS_FOLD_ENABLED = os.environ.get("PDR_FPS_FOLD", "0") != "0"


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _fps_pallas_impl(
    xyz: jax.Array, npoint: int, interpret: bool, stacked: bool
) -> jax.Array:
    B, N, _ = xyz.shape
    Bt = min(B, fps_batch_tile(B, N, stacked))
    fold = 1 if stacked else _fps_fold(Bt, N)
    if fold > 1:
        kernel = functools.partial(_fps_kernel_folded, npoint, fold)
    else:
        kernel = functools.partial(
            _fps_kernel_stacked if stacked else _fps_kernel, npoint
        )

    def run_chunk(planes_chunk):
        bc = planes_chunk.shape[1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((npoint, bc), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((bc * fold, N // fold), jnp.float32)
            ],
            interpret=interpret,
        )(planes_chunk)

    planes = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))  # (3, B, N)
    outs = []
    for i in range(0, B, Bt):
        chunk = planes[:, i : i + Bt]
        if chunk.shape[1] != Bt and B > Bt:
            # pad the ragged tail so every chunk reuses the same program
            chunk = jnp.pad(chunk, ((0, 0), (0, Bt - chunk.shape[1]), (0, 0)))
        outs.append(run_chunk(chunk).T)
    out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    return out[:B]
