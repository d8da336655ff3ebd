"""Approximate Earth Mover's Distance (auction / epsilon-scaling matching).

Reference: Haoqiang Fan's approxmatch CUDA kernel
(PytorchEMD/cuda/emd_kernel.cu:29-247) wrapped at pointnet2/emd.py:6-56.
The algorithm runs 10 epsilon-scaling rounds (level = -4^j for j = 7..-1,
then 0) of softmax-weighted bipartite mass assignment between clouds of n and
m points; the cost is sum(match * squared_dist) / max(n, m).

TPU design: each round is three (n x m) matrix contractions — exp(level*D)
against the remaining masses — which map straight onto the MXU; the 10-round
loop is a `lax.scan`.  The full match matrix is never stored across rounds
when only the cost is needed: the per-round mass delta is contracted with D
on the fly.  Gradients are provided by a custom VJP that stores the thin
per-round mass ratios and accumulates the analytic gradient
(matchcostgrad1/2 in emd_kernel.cu) from them — no auction replay and no
(n x m) residuals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .neighbors import pairwise_sqdist

# level schedule: j = 7..-1 -> -4^j, final round level = 0 (emd_kernel.cu:49-53)
_LEVELS = tuple([-(4.0 ** j) for j in range(7, -2, -1)] + [0.0])


def _init_masses(n: int, m: int) -> tuple[float, float]:
    # integer division exactly as the CUDA code: multiR = n/m with ints
    if n >= m:
        return 1.0, float(n // m)
    return float(m // n), 1.0


def _auction_rounds(d: jax.Array, n: int, m: int):
    """Run the 10 epsilon-scaling rounds.

    Args:
      d: (B, n, m) squared distance matrix.

    Yields via scan: per-round (ratioL, ratioR, level) so callers can contract
    the implied match-delta with arbitrary right-hand sides.

    Returns:
      cost: (B,) sum over rounds of sum(delta * d)  (un-normalized).
    """
    B = d.shape[0]
    multiL, multiR = _init_masses(n, m)
    levels = jnp.asarray(_LEVELS, dtype=jnp.float32)

    def body(carry, level):
        remainL, remainR, cost = carry
        w = jnp.exp(level * d)  # (B, n, m); level <= 0
        suml = (
            jnp.einsum("bnm,bm->bn", w, remainR, preferred_element_type=jnp.float32)
            + 1e-9
        )
        ratioL = remainL / suml
        sumr = (
            jnp.einsum("bnm,bn->bm", w, ratioL, preferred_element_type=jnp.float32)
            * remainR
        )
        consumption = jnp.minimum(remainR / (sumr + 1e-9), 1.0)
        ratioR = consumption * remainR
        remainR = jnp.maximum(0.0, remainR - sumr)
        # delta[k,l] = w * ratioL[k] * ratioR[l]
        delta_row_sum = ratioL * jnp.einsum(
            "bnm,bm->bn", w, ratioR, preferred_element_type=jnp.float32
        )
        remainL = jnp.maximum(0.0, remainL - delta_row_sum)
        cost = cost + jnp.einsum(
            "bn,bnm,bm->b", ratioL, w * d, ratioR, preferred_element_type=jnp.float32
        )
        return (remainL, remainR, cost), (ratioL, ratioR)

    init = (
        jnp.full((B, n), multiL, jnp.float32),
        jnp.full((B, m), multiR, jnp.float32),
        jnp.zeros((B,), jnp.float32),
    )
    (remainL, remainR, cost), (ratiosL, ratiosR) = jax.lax.scan(body, init, levels)
    return cost, ratiosL, ratiosR


def approx_match(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """Full (B, m, n) match matrix (reference ApproxMatchForward layout:
    match[l, k] is mass between xyz2[l] and xyz1[k])."""
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    d = pairwise_sqdist(xyz1, xyz2)  # (B, n, m)
    _, ratiosL, ratiosR = _auction_rounds(d, n, m)
    levels = jnp.asarray(_LEVELS, dtype=jnp.float32)

    def body(acc, inputs):
        level, rL, rR = inputs
        w = jnp.exp(level * d)
        return acc + rL[:, :, None] * w * rR[:, None, :], None

    match, _ = jax.lax.scan(
        body, jnp.zeros_like(d), (levels, ratiosL, ratiosR)
    )  # accumulated round-by-round: peak memory one (B, n, m), not ten
    return jnp.swapaxes(match, 1, 2)


# Materialized (B, n, m) element budget: above this the auction runs the
# row-chunked path that recomputes each chunk's distance plane on the fly
# (the reference CUDA kernel streams the plane the same way,
# emd_kernel.cu:29-247).  2^26 f32 elements = 256 MB per live plane.
_EMD_TILE_ELEMS = 2 ** 26


def _emd_row_chunk(B: int, n: int, m: int) -> int:
    """Row-chunk size for the tiled auction (0 = untiled fits the budget)."""
    if B * n * m <= _EMD_TILE_ELEMS:
        return 0
    nc = max(256, _EMD_TILE_ELEMS // (B * m) // 256 * 256)
    return min(nc, n)


def _pad_rows(x: jax.Array, n_pad: int) -> jax.Array:
    n = x.shape[1]
    if n_pad == n:
        return x
    pad = jnp.zeros((x.shape[0], n_pad - n) + x.shape[2:], x.dtype)
    return jnp.concatenate([x, pad], axis=1)


def _auction_rounds_tiled(xyz1: jax.Array, xyz2: jax.Array, nc: int):
    """Row-chunked epsilon-scaling auction: the (B, n, m) plane is recomputed
    chunk-by-chunk inside each round, never materialized whole.

    Two chunk sweeps per round: sweep A forms suml/ratioL per chunk and
    accumulates the column sums; sweep B (after ratioR is known) forms the
    row-mass deltas and the cost.  Padding rows carry zero left mass, so
    they contribute nothing to any contraction.

    Returns (cost (B,), ratiosL (10, B, n), ratiosR (10, B, m)) — identical
    (up to f32 reduction order) to `_auction_rounds(pairwise_sqdist(...))`.
    """
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    T = -(-n // nc)
    n_pad = T * nc
    x1 = _pad_rows(xyz1.astype(jnp.float32), n_pad)
    x2 = xyz2.astype(jnp.float32)
    x1c = x1.reshape(B, T, nc, 3).transpose(1, 0, 2, 3)  # (T, B, nc, 3)
    multiL, multiR = _init_masses(n, m)
    levels = jnp.asarray(_LEVELS, dtype=jnp.float32)
    real_row = (
        jax.lax.broadcasted_iota(jnp.int32, (B, n_pad), 1) < n
    ).astype(jnp.float32)

    def chunk_d(x1_chunk):
        return pairwise_sqdist(x1_chunk, x2)  # (B, nc, m)

    def body(carry, level):
        remainL, remainR, cost = carry  # (B, n_pad), (B, m), (B,)
        remLc = remainL.reshape(B, T, nc).transpose(1, 0, 2)

        def sweep_a(sumr_acc, inp):
            x1_chunk, remL_chunk = inp
            w = jnp.exp(level * chunk_d(x1_chunk))
            suml = (
                jnp.einsum("bnm,bm->bn", w, remainR,
                           preferred_element_type=jnp.float32) + 1e-9
            )
            ratioL = remL_chunk / suml
            sumr_acc = sumr_acc + jnp.einsum(
                "bnm,bn->bm", w, ratioL, preferred_element_type=jnp.float32
            )
            return sumr_acc, ratioL

        sumr_acc, ratioLc = jax.lax.scan(
            sweep_a, jnp.zeros((B, m), jnp.float32), (x1c, remLc)
        )
        sumr = sumr_acc * remainR
        consumption = jnp.minimum(remainR / (sumr + 1e-9), 1.0)
        ratioR = consumption * remainR
        remainR_new = jnp.maximum(0.0, remainR - sumr)

        def sweep_b(cost_acc, inp):
            x1_chunk, ratioL_chunk = inp
            d = chunk_d(x1_chunk)
            w = jnp.exp(level * d)
            drs = ratioL_chunk * jnp.einsum(
                "bnm,bm->bn", w, ratioR, preferred_element_type=jnp.float32
            )
            cost_acc = cost_acc + jnp.einsum(
                "bn,bnm,bm->b", ratioL_chunk, w * d, ratioR,
                preferred_element_type=jnp.float32,
            )
            return cost_acc, drs

        cost_new, drsc = jax.lax.scan(sweep_b, cost, (x1c, ratioLc))
        remainL_new = jnp.maximum(
            0.0, remainL - drsc.transpose(1, 0, 2).reshape(B, n_pad)
        ) * real_row
        ratioL_full = ratioLc.transpose(1, 0, 2).reshape(B, n_pad)
        return (remainL_new, remainR_new, cost_new), (ratioL_full, ratioR)

    init = (
        jnp.full((B, n_pad), multiL, jnp.float32) * real_row,
        jnp.full((B, m), multiR, jnp.float32),
        jnp.zeros((B,), jnp.float32),
    )
    (_, _, cost), (ratiosL, ratiosR) = jax.lax.scan(body, init, levels)
    return cost, ratiosL[:, :, :n], ratiosR


@jax.custom_vjp
def earth_mover_distance(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """Approximate EMD per batch element, normalized by max(n, m).

    Args:
      xyz1: (B, n, 3); xyz2: (B, m, 3).

    Returns:
      (B,) costs — matching pointnet2/emd.py:6-28 (cost / max(n, m)).
      Large clouds (e.g. the 16384-pt refine+upsample eval) run the
      row-chunked auction automatically (see _EMD_TILE_ELEMS).
    """
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    nc = _emd_row_chunk(B, n, m)
    if nc:
        cost, _, _ = _auction_rounds_tiled(xyz1, xyz2, nc)
        return cost / max(n, m)
    d = pairwise_sqdist(xyz1, xyz2)
    cost, _, _ = _auction_rounds(d, n, m)
    return cost / max(n, m)


def _emd_fwd(xyz1, xyz2):
    """Forward that stores the per-round mass ratios as residuals.

    The reference backward reuses the stored (m, n) match
    (emd_kernel.cu matchcostgrad1/2 read the forward's `match`); here the
    match's rank-structured decomposition match = sum_r ratioL_r (x) w_r (x)
    ratioR_r is stored instead — (10, B, n) + (10, B, m) floats, ~n/10 the
    match's footprint — and the backward re-forms only the thin
    match-vector contractions it needs, round by round, without replaying
    the sequential auction or materializing any (B, n, m) round tensor."""
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    nc = _emd_row_chunk(B, n, m)
    if nc:
        cost, ratiosL, ratiosR = _auction_rounds_tiled(xyz1, xyz2, nc)
    else:
        d = pairwise_sqdist(xyz1, xyz2)
        cost, ratiosL, ratiosR = _auction_rounds(d, n, m)
    return cost / max(n, m), (xyz1, xyz2, ratiosL, ratiosR)


def _emd_bwd(res, g):
    """Analytic gradient (emd_kernel.cu matchcostgrad1/2): with the match held
    fixed, d cost / d x1_k = sum_l 2 match[l,k] (x1_k - x2_l) / max(n,m).

    Needs only row = match @ 1, col = match^T @ 1, match @ xyz2 and
    match^T @ xyz1; with the stored round decomposition each is a scan of
    two thin (n x m)(m x 4) MXU contractions against [ratio, ratio * xyz]."""
    xyz1, xyz2, ratiosL, ratiosR = res
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    levels = jnp.asarray(_LEVELS, dtype=jnp.float32)

    # right-hand sides: [1, xyz] so one contraction yields both the mass sum
    # and the position-weighted sum
    rhs2 = jnp.concatenate([jnp.ones((B, m, 1), jnp.float32), xyz2], axis=-1)
    rhs1 = jnp.concatenate([jnp.ones((B, n, 1), jnp.float32), xyz1], axis=-1)

    nc = _emd_row_chunk(B, n, m)
    if nc:
        # row-chunked: recompute each chunk's plane, like the tiled forward
        T = -(-n // nc)
        n_pad = T * nc
        x1c = _pad_rows(xyz1.astype(jnp.float32), n_pad).reshape(
            B, T, nc, 3).transpose(1, 0, 2, 3)
        rhs1c = _pad_rows(rhs1, n_pad).reshape(B, T, nc, 4).transpose(1, 0, 2, 3)
        x2 = xyz2.astype(jnp.float32)

        def body(acc, inputs):
            level, ratioL, ratioR = inputs
            rLc = _pad_rows(ratioL[..., None], n_pad)[..., 0].reshape(
                B, T, nc).transpose(1, 0, 2)
            rr_rhs2 = ratioR[..., None] * rhs2

            def chunk(acc2, inp):
                x1_chunk, rL_chunk, rhs1_chunk = inp
                w = jnp.exp(level * pairwise_sqdist(x1_chunk, x2))
                a_chunk = jnp.einsum(
                    "bnm,bmc->bnc", w, rr_rhs2,
                    preferred_element_type=jnp.float32,
                )  # (B, nc, 4)
                acc2 = acc2 + jnp.einsum(
                    "bnm,bnc->bmc", w, rL_chunk[..., None] * rhs1_chunk,
                    preferred_element_type=jnp.float32,
                )
                return acc2, a_chunk

            acc2_new, a_chunks = jax.lax.scan(
                chunk, jnp.zeros((B, m, 4), jnp.float32), (x1c, rLc, rhs1c)
            )
            a = a_chunks.transpose(1, 0, 2, 3).reshape(B, n_pad, 4)[:, :n]
            acc1, acc2 = acc
            return (
                acc1 + ratioL[..., None] * a,
                acc2 + ratioR[..., None] * acc2_new,
            ), None
    else:
        d = pairwise_sqdist(xyz1, xyz2)  # recomputed: one matmul, no residual

        def body(acc, inputs):
            level, ratioL, ratioR = inputs
            w = jnp.exp(level * d)  # (B, n, m)
            a = jnp.einsum(
                "bnm,bmc->bnc", w, ratioR[..., None] * rhs2,
                preferred_element_type=jnp.float32,
            )  # (B, n, 4): [w @ ratioR, w @ (ratioR * xyz2)]
            b = jnp.einsum(
                "bnm,bnc->bmc", w, ratioL[..., None] * rhs1,
                preferred_element_type=jnp.float32,
            )  # (B, m, 4)
            acc1, acc2 = acc
            return (acc1 + ratioL[..., None] * a, acc2 + ratioR[..., None] * b), None

    (acc1, acc2), _ = jax.lax.scan(
        body,
        (jnp.zeros((B, n, 4), jnp.float32), jnp.zeros((B, m, 4), jnp.float32)),
        (levels, ratiosL, ratiosR),
    )
    row, mx2 = acc1[..., 0], acc1[..., 1:]  # match @ 1, match @ xyz2
    col, mx1 = acc2[..., 0], acc2[..., 1:]  # match^T @ 1, match^T @ xyz1
    scale = (g / max(n, m))[:, None, None]
    g1 = 2.0 * scale * (xyz1 * row[..., None] - mx2)
    g2 = 2.0 * scale * (xyz2 * col[..., None] - mx1)
    return g1, g2


earth_mover_distance.defvjp(_emd_fwd, _emd_bwd)
