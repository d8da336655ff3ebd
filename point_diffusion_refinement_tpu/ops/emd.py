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
on the fly.  Gradients are provided by a custom VJP that replays the rounds
and accumulates the analytic gradient (matchcostgrad1/2 in emd_kernel.cu)
without retaining per-round (n x m) residuals.
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
    w = jnp.exp(levels[:, None, None, None] * d[None])  # (10, B, n, m)
    match = jnp.einsum(
        "rbn,rbnm,rbm->bnm", ratiosL, w, ratiosR, preferred_element_type=jnp.float32
    )
    return jnp.swapaxes(match, 1, 2)


@jax.custom_vjp
def earth_mover_distance(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """Approximate EMD per batch element, normalized by max(n, m).

    Args:
      xyz1: (B, n, 3); xyz2: (B, m, 3).

    Returns:
      (B,) costs — matching pointnet2/emd.py:6-28 (cost / max(n, m)).
    """
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    d = pairwise_sqdist(xyz1, xyz2)
    cost, _, _ = _auction_rounds(d, n, m)
    return cost / max(n, m)


def _emd_fwd(xyz1, xyz2):
    return earth_mover_distance(xyz1, xyz2), (xyz1, xyz2)


def _emd_bwd(res, g):
    """Analytic gradient (emd_kernel.cu matchcostgrad1/2): with the match held
    fixed, d cost / d x1_k = sum_l 2 match[l,k] (x1_k - x2_l) / max(n,m)."""
    xyz1, xyz2 = res
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    match_t = approx_match(xyz1, xyz2)  # (B, m, n)
    match = jnp.swapaxes(match_t, 1, 2)  # (B, n, m)
    row = jnp.sum(match, axis=2)  # (B, n)
    col = jnp.sum(match, axis=1)  # (B, m)
    scale = (g / max(n, m))[:, None, None]
    g1 = 2.0 * scale * (
        xyz1 * row[..., None]
        - jnp.einsum("bnm,bmc->bnc", match, xyz2, preferred_element_type=jnp.float32)
    )
    g2 = 2.0 * scale * (
        xyz2 * col[..., None]
        - jnp.einsum("bnm,bnc->bmc", match, xyz1, preferred_element_type=jnp.float32)
    )
    return g1, g2


earth_mover_distance.defvjp(_emd_fwd, _emd_bwd)
