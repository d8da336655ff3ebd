"""Neighbor-count statistics for tuning ball-query radii.

Reference: record_neighbor_stats (pointnet2_utils.py:423-428,
pointnet2_with_pcld_condition.py:478-510): min/mean/max and deciles of the
per-center in-radius neighbor count, printed per module to choose radii so
balls neither starve nor saturate nsample.

Here it is a standalone analysis pass (the hot path stays
instrumentation-free): run it on sample clouds with the config's radius
ladder and print the same quantile table.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.neighbors import ball_query
from ..ops.sampling import furthest_point_sample, gather_points

QUANTILES = np.linspace(0.0, 1.0, 11)


def count_stats(counts: np.ndarray) -> dict:
    counts = np.asarray(counts, np.float64).reshape(-1)
    return {
        "min": float(counts.min()),
        "mean": float(counts.mean()),
        "max": float(counts.max()),
        "quantiles": np.quantile(counts, QUANTILES).astype(np.int64),
    }


def sa_ladder_neighbor_stats(
    xyz, npoints, radii, nsamples
) -> list[dict]:
    """Walk an SA ladder (FPS + ball query per level) collecting count stats.

    Args:
      xyz: (B, N, 3) sample clouds (e.g. one training batch).
      npoints/radii/nsamples: the config's architecture lists.
    """
    out = []
    cur = jnp.asarray(xyz)
    for npoint, radius, nsample in zip(npoints, radii, nsamples):
        idx = furthest_point_sample(cur, int(npoint))
        centers = gather_points(cur, idx)
        _, counts = ball_query(cur, centers, float(radius), int(nsample))
        s = count_stats(np.asarray(counts))
        s.update({"npoint": int(npoint), "radius": float(radius), "nsample": int(nsample)})
        out.append(s)
        cur = centers
    return out


def report(stats: list[dict], name: str = "SA ladder") -> str:
    lines = [f"{name}: neighbor count stats (min/mean/max + deciles)"]
    for s in stats:
        lines.append(
            f"  npoint={s['npoint']:<6} r={s['radius']:<5} K={s['nsample']:<4}"
            f" min={s['min']:.0f} mean={s['mean']:.1f} max={s['max']:.0f}"
            f" deciles={list(s['quantiles'])}"
        )
    text = "\n".join(lines)
    print(text, flush=True)
    return text
