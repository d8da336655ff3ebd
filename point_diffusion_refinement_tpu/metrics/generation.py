"""Generation-quality metrics: MMD / COV / 1-NNA over pairwise CD/EMD, and
JSD of occupancy grids.

Reference: pointnet2/models/pvd/metrics/evaluation_metrics.py:29-275
(EMD_CD, _pairwise_EMD_CD_, knn, lgan_mmd_cov, compute_all_metrics,
jsd_between_point_cloud_sets).  The O(S x R) pairwise distance matrices are
computed as jitted batched sweeps (one sample against a block of references)
instead of per-pair CUDA launches; the voxel-occupancy JSD uses a direct
quantization instead of a sklearn NearestNeighbors search (the grid IS a
uniform lattice, so nearest-cell = rounding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.chamfer import chamfer_distance, fscore
from ..ops.emd import earth_mover_distance


def emd_cd(sample_pcs, ref_pcs, f1_threshold: float = 1e-3) -> dict:
    """Per-pair CD / EMD / F1 (evaluation_metrics.py:29-43)."""
    dl, dr = chamfer_distance(sample_pcs, ref_pcs)
    f1, _, _ = fscore(dl, dr, threshold=f1_threshold)
    cd = dl.mean(axis=1) + dr.mean(axis=1)
    emd = earth_mover_distance(sample_pcs, ref_pcs)
    return {"CD": cd, "EMD": emd, "fscore": f1}


def _block_vs_block_impl(sample_block, ref_block):
    """(Sb, N, 3) x (Rb, N, 3) -> ((Sb, Rb) cd, (Sb, Rb) emd).

    All Sb*Rb pairs ride ONE flat batch through the chamfer/EMD kernels —
    one device dispatch per (Sb x Rb) tile instead of the reference's
    per-pair loop (_pairwise_EMD_CD_, evaluation_metrics.py:45-80)."""
    Sb = sample_block.shape[0]
    Rb = ref_block.shape[0]
    s = jnp.repeat(sample_block, Rb, axis=0)  # (Sb*Rb, N, 3)
    r = jnp.tile(ref_block, (Sb, 1, 1))
    dl, dr = chamfer_distance(s, r)
    cd = dl.mean(axis=1) + dr.mean(axis=1)
    emd = earth_mover_distance(s, r)
    return cd.reshape(Sb, Rb), emd.reshape(Sb, Rb)


_block_vs_block = jax.jit(_block_vs_block_impl)


@jax.jit
def _block_vs_tile_scan(sample_block, ref_tiles):
    """(Sb, N, 3) x (C, Rb, N, 3) -> ((C, Sb, Rb) cd, (C, Sb, Rb) emd).

    A whole row-chunk of ref tiles sweeps through ONE jitted lax.scan, so an
    S x R sweep costs ceil(S/Sb) * ceil(R/(C*Rb)) device dispatches instead
    of ceil(S/Sb) * ceil(R/Rb) (at MVP scale, dozens instead of thousands).
    The chunk stays a parameter because a single device execution must stay
    well under the tunnel's ~30 s execution ceiling (STATUS.md gotchas)."""

    def body(carry, rb):
        return carry, _block_vs_block_impl(sample_block, rb)

    _, (cd, emd) = jax.lax.scan(body, 0, ref_tiles)
    return cd, emd


def pairwise_emd_cd(sample_pcs, ref_pcs, batch_size: int = 16,
                    sample_batch_size: int = 16, scan_chunk: int = 8):
    """Full (S, R) pairwise CD and EMD matrices
    (_pairwise_EMD_CD_, evaluation_metrics.py:45-80).

    Tiles BOTH axes and scans ``scan_chunk`` reference tiles per dispatch:
    an S x R sweep is ceil(S/Sb) * ceil(R/(scan_chunk*Rb)) device calls.
    Shrink the block sizes if the (Sb*Rb, N, N) distance planes press on
    device memory at large N; shrink ``scan_chunk`` if single executions
    approach the tunnel's execution ceiling."""
    S = sample_pcs.shape[0]
    R = ref_pcs.shape[0]
    Sb = max(1, min(sample_batch_size, S))
    Rb = max(1, min(batch_size, R))
    C = max(1, int(scan_chunk))
    all_cd = np.zeros((S, R), np.float32)
    all_emd = np.zeros((S, R), np.float32)
    sample = jnp.asarray(sample_pcs)
    ref = jnp.asarray(ref_pcs)
    # pad to full tiles: ragged tails would recompile the jitted sweeps
    def tiles(n, b):
        return [(i, min(b, n - i)) for i in range(0, n, b)]

    def pad_rows(x, want):
        if x.shape[0] == want:
            return x
        return jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (want - x.shape[0],) + x.shape[1:])]
        )

    for i, si in tiles(S, Sb):
        sb = pad_rows(sample[i : i + si], Sb)
        for j0, rj0 in tiles(R, C * Rb):
            # chunk of up to C ref tiles, padded to exactly (C, Rb, N, 3)
            chunk = pad_rows(
                ref[j0 : j0 + rj0],
                ((rj0 + Rb - 1) // Rb) * Rb,
            )
            n_t = chunk.shape[0] // Rb
            chunk = chunk.reshape((n_t, Rb) + chunk.shape[1:])
            if n_t < C:
                chunk = jnp.concatenate(
                    [chunk, jnp.broadcast_to(chunk[:1], (C - n_t,) + chunk.shape[1:])]
                )
            cd, emd = _block_vs_tile_scan(sb, chunk)  # (C, Sb, Rb)
            cd = np.asarray(cd)[:n_t, :si].transpose(1, 0, 2).reshape(si, -1)
            emd = np.asarray(emd)[:n_t, :si].transpose(1, 0, 2).reshape(si, -1)
            all_cd[i : i + si, j0 : j0 + rj0] = cd[:, :rj0]
            all_emd[i : i + si, j0 : j0 + rj0] = emd[:, :rj0]
    return all_cd, all_emd


def lgan_mmd_cov(all_dist: np.ndarray) -> dict:
    """MMD & coverage from an (S, R) distance matrix
    (evaluation_metrics.py:117-130)."""
    min_from_sample = all_dist.min(axis=1)
    min_idx = all_dist.argmin(axis=1)
    min_from_ref = all_dist.min(axis=0)
    return {
        "lgan_mmd": float(min_from_ref.mean()),
        "lgan_cov": float(len(np.unique(min_idx)) / all_dist.shape[1]),
        "lgan_mmd_smp": float(min_from_sample.mean()),
    }


def one_nn_accuracy(Mxx: np.ndarray, Mxy: np.ndarray, Myy: np.ndarray, k: int = 1) -> dict:
    """1-NN two-sample classifier accuracy (knn,
    evaluation_metrics.py:84-113).  ~0.5 means the sample distribution is
    indistinguishable from the reference."""
    n0, n1 = Mxx.shape[0], Myy.shape[0]
    label = np.concatenate([np.ones(n0), np.zeros(n1)])
    M = np.block([[Mxx, Mxy], [Mxy.T, Myy]]).astype(np.float64)
    np.fill_diagonal(M, np.inf)
    idx = np.argsort(M, axis=0)[:k]  # k smallest per column
    count = label[idx].sum(axis=0)
    pred = (count >= k / 2.0).astype(np.float64)
    tp = (pred * label).sum()
    fp = (pred * (1 - label)).sum()
    fn = ((1 - pred) * label).sum()
    tn = ((1 - pred) * (1 - label)).sum()
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": tp / (tp + fp + 1e-10),
        "recall": tp / (tp + fn + 1e-10),
        "acc_t": tp / (tp + fn + 1e-10),
        "acc_f": tn / (tn + fp + 1e-10),
        "acc": float((pred == label).mean()),
    }


def compute_all_metrics(sample_pcs, ref_pcs, batch_size: int = 16) -> dict:
    """MMD/COV + 1-NNA over both CD and EMD
    (compute_all_metrics, evaluation_metrics.py:133-158)."""
    results = {}
    M_rs_cd, M_rs_emd = pairwise_emd_cd(ref_pcs, sample_pcs, batch_size)
    for name, M in (("CD", M_rs_cd), ("EMD", M_rs_emd)):
        for k, v in lgan_mmd_cov(M.T).items():
            results[f"{k}-{name}"] = v
    M_rr_cd, M_rr_emd = pairwise_emd_cd(ref_pcs, ref_pcs, batch_size)
    M_ss_cd, M_ss_emd = pairwise_emd_cd(sample_pcs, sample_pcs, batch_size)
    for name, (rr, rs, ss) in (
        ("CD", (M_rr_cd, M_rs_cd, M_ss_cd)),
        ("EMD", (M_rr_emd, M_rs_emd, M_ss_emd)),
    ):
        res = one_nn_accuracy(rr, rs, ss, 1)
        results.update({f"1-NN-{name}-{k}": v for k, v in res.items() if "acc" in k})
    return results


# ---- JSD (latent_3d_points occupancy grids) ----------------------------


def unit_cube_grid_point_cloud(resolution: int, clip_sphere: bool = False):
    """Cell-center lattice of a resolution^3 grid in the unit cube
    (evaluation_metrics.py:163-181)."""
    spacing = 1.0 / (resolution - 1)
    ax = np.arange(resolution) * spacing - 0.5
    grid = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), axis=-1).astype(np.float32)
    if clip_sphere:
        grid = grid.reshape(-1, 3)
        grid = grid[np.linalg.norm(grid, axis=1) <= 0.5]
    return grid, spacing


def _occupancy_counts(pclouds: np.ndarray, resolution: int, in_sphere: bool):
    """Nearest grid cell by direct quantization (the lattice is uniform, so
    rounding IS the 1-NN search the reference performs with sklearn)."""
    spacing = 1.0 / (resolution - 1)
    n_cells = resolution ** 3
    counters = np.zeros(n_cells)
    bernoulli = np.zeros(n_cells)
    if in_sphere:
        grid, _ = unit_cube_grid_point_cloud(resolution, True)
        # map full-lattice flat index -> clipped index (or -1)
        full, _ = unit_cube_grid_point_cloud(resolution, False)
        full = full.reshape(-1, 3)
        inside = np.linalg.norm(full, axis=1) <= 0.5
        remap = -np.ones(n_cells, dtype=np.int64)
        remap[inside] = np.arange(inside.sum())
        counters = np.zeros(inside.sum())
        bernoulli = np.zeros(inside.sum())
    for pc in pclouds:
        cells = np.clip(np.round((pc + 0.5) / spacing), 0, resolution - 1).astype(np.int64)
        flat = cells[:, 0] * resolution ** 2 + cells[:, 1] * resolution + cells[:, 2]
        if in_sphere:
            # points outside the sphere snap to their nearest in-sphere cell:
            # project the point onto the sphere first (radius 0.5)
            r = np.linalg.norm(pc, axis=1, keepdims=True)
            proj = np.where(r > 0.5, pc * (0.5 / np.maximum(r, 1e-9)), pc)
            cells = np.clip(
                np.round((proj + 0.5) / spacing), 0, resolution - 1
            ).astype(np.int64)
            flat = cells[:, 0] * resolution ** 2 + cells[:, 1] * resolution + cells[:, 2]
            flat = remap[flat]
            flat = flat[flat >= 0]
        np.add.at(counters, flat, 1)
        bernoulli[np.unique(flat)] += 1
    return counters, bernoulli


def entropy_of_occupancy_grid(pclouds, grid_resolution: int, in_sphere: bool = False):
    """(mean Bernoulli entropy, grid counters)
    (evaluation_metrics.py:198-237)."""
    counters, bernoulli = _occupancy_counts(
        np.asarray(pclouds), grid_resolution, in_sphere
    )
    n = float(len(pclouds))
    p = bernoulli[bernoulli > 0] / n
    p = np.clip(p, 1e-12, 1 - 1e-12)
    ent = -(p * np.log(p) + (1 - p) * np.log(1 - p))
    return float(ent.sum() / len(counters)), counters


def jensen_shannon_divergence(P: np.ndarray, Q: np.ndarray) -> float:
    """Base-2 JSD of two histograms (evaluation_metrics.py:240-259)."""
    P = np.asarray(P, np.float64)
    Q = np.asarray(Q, np.float64)
    if (P < 0).any() or (Q < 0).any():
        raise ValueError("Negative values.")
    if len(P) != len(Q):
        raise ValueError("Non equal size.")
    P_ = P / P.sum()
    Q_ = Q / Q.sum()
    M = 0.5 * (P_ + Q_)

    def kl(a, b):
        idx = (a > 0) & (b > 0)
        return float(np.sum(a[idx] * np.log2(a[idx] / b[idx])))

    return 0.5 * (kl(P_, M) + kl(Q_, M))


def jsd_between_point_cloud_sets(sample_pcs, ref_pcs, resolution: int = 28) -> float:
    """(evaluation_metrics.py:184-195)"""
    _, sample_counters = entropy_of_occupancy_grid(sample_pcs, resolution, True)
    _, ref_counters = entropy_of_occupancy_grid(ref_pcs, resolution, True)
    return jensen_shannon_divergence(sample_counters, ref_counters)
