"""Import the reference's pure-torch modules on CPU for value-level parity
tests.

The reference's CUDA extension (`pointnet2_ops._ext`) and `pytorch3d` cannot
be built in this environment; both are stubbed here with small pure-torch CPU
implementations that reproduce the CUDA kernels' exact semantics
(pointnet2_ops/_ext-src/src/*.cu), so the reference's Python modules — up to
and including the full dual-path denoiser — run unmodified on CPU and can be
compared value-for-value against this repo's Flax modules.

These stubs are original test code (re-implementations from the kernels'
observed semantics), not copies of the reference.
"""

from __future__ import annotations

import sys
import types
from collections import namedtuple

import torch

REF_OPS_LIB = "/root/reference/pointnet2_ops_lib"
REF_POINTNET2 = "/root/reference/pointnet2"


# ---------------------------------------------------------------------------
# _ext stub: CPU torch implementations of the CUDA kernels
# ---------------------------------------------------------------------------

def furthest_point_sampling(xyz: torch.Tensor, npoint: int) -> torch.Tensor:
    """sampling_gpu.cu:69-173: idx[0]=0; iteratively pick the point with the
    largest running min-distance to the selected set, skipping points with
    squared norm <= 1e-3 (padding rows)."""
    B, N, _ = xyz.shape
    idx = torch.zeros(B, npoint, dtype=torch.int32)
    mindist = torch.full((B, N), 1e10)
    valid = (xyz.pow(2).sum(-1) > 1e-3)
    old = torch.zeros(B, dtype=torch.long)
    for j in range(1, npoint):
        ref = xyz[torch.arange(B), old]  # (B, 3)
        d = (xyz - ref[:, None, :]).pow(2).sum(-1)
        mindist = torch.minimum(mindist, d)
        cand = torch.where(valid, mindist, torch.full_like(mindist, -1.0))
        old = cand.argmax(dim=1)
        idx[:, j] = old.to(torch.int32)
    return idx


def gather_points(features: torch.Tensor, idx: torch.Tensor) -> torch.Tensor:
    """sampling_gpu.cu:8-29: out[b,c,j] = features[b,c,idx[b,j]]."""
    B, C, _ = features.shape
    return features.gather(
        2, idx.long().unsqueeze(1).expand(B, C, idx.shape[1])
    )


def gather_points_grad(grad_out, idx, n):
    B, C, M = grad_out.shape
    grad = torch.zeros(B, C, n, dtype=grad_out.dtype)
    grad.scatter_add_(2, idx.long().unsqueeze(1).expand(B, C, M), grad_out)
    return grad


def ball_query(new_xyz, xyz, radius, nsample):
    """ball_query_gpu.cu:9-47: first <= nsample points with d2 < r^2 in index
    order; all slots pre-filled with the FIRST neighbor; counts per center.
    Centers with no neighbor keep idx row 0 and count 0."""
    B, M, _ = new_xyz.shape
    N = xyz.shape[1]
    idx = torch.zeros(B, M, nsample, dtype=torch.int32)
    counts = torch.zeros(B, M, dtype=torch.int32)
    r2 = radius * radius
    d2 = torch.cdist(new_xyz, xyz).pow(2)  # (B, M, N)
    within = d2 < r2
    for b in range(B):
        for j in range(M):
            ks = torch.nonzero(within[b, j], as_tuple=False).flatten()
            if ks.numel() == 0:
                continue
            ks = ks[:nsample]
            idx[b, j, :] = ks[0].to(torch.int32)
            idx[b, j, : ks.numel()] = ks.to(torch.int32)
            counts[b, j] = ks.numel()
    return idx, counts


def group_points(features, idx):
    """group_points_gpu.cu:8-28: (B,C,N) x (B,M,K) -> (B,C,M,K)."""
    B, C, N = features.shape
    M, K = idx.shape[1], idx.shape[2]
    flat = idx.long().reshape(B, 1, M * K).expand(B, C, M * K)
    return features.gather(2, flat).reshape(B, C, M, K)


def group_points_grad(grad_out, idx, n):
    B, C, M, K = grad_out.shape
    grad = torch.zeros(B, C, n, dtype=grad_out.dtype)
    flat = idx.long().reshape(B, 1, M * K).expand(B, C, M * K)
    grad.scatter_add_(2, flat, grad_out.reshape(B, C, M * K))
    return grad


def three_nn(unknown, known):
    """interpolate_gpu.cu:9-59: 3 nearest neighbors, ascending distance.
    Returns (dist2 (B,N,3), idx (B,N,3) int32)."""
    d2 = torch.cdist(unknown, known).pow(2)
    dist2, idx = torch.topk(d2, k=3, dim=2, largest=False, sorted=True)
    return dist2, idx.to(torch.int32)


def three_interpolate(features, idx, weight):
    """interpolate_gpu.cu:72-154: (B,C,M) gathered at idx (B,N,3), weighted."""
    B, C, _ = features.shape
    N = idx.shape[1]
    flat = idx.long().reshape(B, 1, N * 3).expand(B, C, N * 3)
    g = features.gather(2, flat).reshape(B, C, N, 3)
    return (g * weight.unsqueeze(1)).sum(-1)


def three_interpolate_grad(grad_out, idx, weight, m):
    B, C, N = grad_out.shape
    grad = torch.zeros(B, C, m, dtype=grad_out.dtype)
    contrib = grad_out.unsqueeze(-1) * weight.unsqueeze(1)  # (B,C,N,3)
    flat = idx.long().reshape(B, 1, N * 3).expand(B, C, N * 3)
    grad.scatter_add_(2, flat, contrib.reshape(B, C, N * 3))
    return grad


# ---------------------------------------------------------------------------
# pytorch3d stub: knn_points / knn_gather (squared dists, ascending)
# ---------------------------------------------------------------------------

_KNN = namedtuple("KNN", ["dists", "idx", "knn"])


def knn_points(x, y, K=1, return_nn=False, **_kw):
    d2 = torch.cdist(x, y).pow(2)  # (B, N1, N2)
    dists, idx = torch.topk(d2, k=K, dim=2, largest=False, sorted=True)
    nn = knn_gather(y, idx) if return_nn else None
    return _KNN(dists=dists, idx=idx, knn=nn)


def knn_gather(features, idx):
    """(B, N2, C) gathered by idx (B, N1, K) -> (B, N1, K, C)."""
    B, N1, K = idx.shape
    C = features.shape[2]
    flat = idx.reshape(B, N1 * K, 1).expand(B, N1 * K, C)
    return features.gather(1, flat).reshape(B, N1, K, C)


def _install_stubs():
    if "pointnet2_ops._ext" in sys.modules:
        return
    ext = types.ModuleType("pointnet2_ops._ext")
    for fn in (
        furthest_point_sampling,
        gather_points,
        gather_points_grad,
        ball_query,
        group_points,
        group_points_grad,
        three_nn,
        three_interpolate,
        three_interpolate_grad,
    ):
        setattr(ext, fn.__name__, fn)
    sys.modules["pointnet2_ops._ext"] = ext

    p3d = types.ModuleType("pytorch3d")
    p3d_ops = types.ModuleType("pytorch3d.ops")
    knn_mod = types.ModuleType("pytorch3d.ops.knn")
    knn_mod.knn_points = knn_points
    knn_mod.knn_gather = knn_gather
    p3d_ops.knn = knn_mod
    p3d_ops.knn_points = knn_points
    p3d_ops.knn_gather = knn_gather
    p3d.ops = p3d_ops
    sys.modules["pytorch3d"] = p3d
    sys.modules["pytorch3d.ops"] = p3d_ops
    sys.modules["pytorch3d.ops.knn"] = knn_mod

    # version file import inside pointnet2_ops/__init__
    for path in (REF_OPS_LIB, REF_POINTNET2):
        if path not in sys.path:
            sys.path.insert(0, path)


def _load_file_module(name, path):
    """Import a reference file directly, bypassing its package __init__
    (models/__init__.py assumes an installed `pointnet2` package)."""
    import importlib.util

    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_modules():
    """Returns (pointnet2_utils, pointnet2_modules, attention, pnet) from the
    reference, with CUDA/pytorch3d stubbed for CPU execution."""
    _install_stubs()
    from pointnet2_ops import pointnet2_modules, pointnet2_utils
    from pointnet2_ops import attention

    pnet = _load_file_module(
        "ref_pnet", f"{REF_POINTNET2}/models/pnet.py"
    )
    return pointnet2_utils, pointnet2_modules, attention, pnet


def load_reference_model():
    """Returns the reference's full PointNet2CloudCondition class
    (pointnet2_with_pcld_condition.py:24-511), importable on CPU thanks to
    the kernel stubs — the apex target for the torch<->flax parity suite."""
    _install_stubs()
    ref_root = "/root/reference"
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    from pointnet2.models.pointnet2_with_pcld_condition import (
        PointNet2CloudCondition,
    )

    return PointNet2CloudCondition
