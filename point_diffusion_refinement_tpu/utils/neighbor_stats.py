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


class NeighborStatsAccumulator:
    """Accumulate per-module neighbor-count histograms across forwards.

    The modules sow one (nsample+1,) count histogram per forward into the
    'neighbor_stats' collection (models/modules.py:_sow_count_hist); feeding
    each step's collection here keeps an exact running histogram per module,
    so the report reflects every augmented batch seen — a strictly stronger
    instrument than the reference's latest-batch snapshot
    (pointnet2_utils.py:423-428).
    """

    def __init__(self):
        self.hists: dict[str, np.ndarray] = {}
        self.forwards = 0

    def update(self, collection: dict) -> None:
        """Merge one apply()'s 'neighbor_stats' collection."""
        if not collection:
            return
        self.forwards += 1
        import jax

        for path, leaf in jax.tree_util.tree_flatten_with_path(collection)[0]:
            # path ends with .count_hist and the sow tuple index
            parts = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
            name = "/".join(str(p) for p in parts if isinstance(p, str))
            h = np.asarray(leaf, np.float64)
            if name in self.hists:
                self.hists[name] = self.hists[name] + h
            else:
                self.hists[name] = h

    @staticmethod
    def _stats_from_hist(hist: np.ndarray) -> dict:
        total = hist.sum()
        vals = np.arange(len(hist))
        nz = np.nonzero(hist)[0]
        cum = np.cumsum(hist) / max(total, 1.0)
        quant = np.array([vals[np.searchsorted(cum, q)] for q in
                          np.clip(QUANTILES, 1e-12, 1 - 1e-12)], np.int64)
        return {
            "min": float(nz[0]) if len(nz) else 0.0,
            "mean": float((vals * hist).sum() / max(total, 1.0)),
            "max": float(nz[-1]) if len(nz) else 0.0,
            "quantiles": quant,
        }

    def stats(self) -> dict:
        return {k: self._stats_from_hist(v) for k, v in sorted(self.hists.items())}

    def report(self) -> str:
        """Per-module min/mean/max + decile report
        (report_neighbor_stats, pointnet2_with_pcld_condition.py:478-510)."""
        lines = [
            f"neighbor count stats over {self.forwards} forwards "
            "(min/mean/max + deciles)"
        ]
        for name, s in self.stats().items():
            lines.append(
                f"  {name}: min={s['min']:.0f} mean={s['mean']:.1f} "
                f"max={s['max']:.0f} deciles={list(s['quantiles'])}"
            )
        text = "\n".join(lines)
        print(text, flush=True)
        return text


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


def _fps_ladder(xyz, npoints):
    """Positions at each ladder level: [raw, after SA_0, after SA_1, ...]."""
    levels = [jnp.asarray(xyz)]
    for npoint in npoints:
        idx = furthest_point_sample(levels[-1], int(npoint))
        levels.append(gather_points(levels[-1], idx))
    return levels


def _query_stats(src, centers, radius, nsample) -> dict:
    _, counts = ball_query(src, centers, float(radius), int(nsample))
    s = count_stats(np.asarray(counts))
    s.update({"npoint": centers.shape[1], "radius": float(radius),
              "nsample": int(nsample)})
    return s


def model_neighbor_stats(pointnet_config: dict, x, condition) -> str:
    """The in-model neighbor-count report, per module group.

    Functional equivalent of the reference's in-forward recording + report
    (pointnet2_utils.py:423-428, pointnet2_with_pcld_condition.py:478-510):
    walks both SA ladders and the encoder/decoder feature-transfer modules
    with the config's radius/nsample ladders on a sample batch, printing the
    same min/mean/max + decile table used to tune ball-query radii.  Enabled
    by the ``record_neighbor_stats`` config flag (train loop runs it once on
    the first batch).

    Args:
      pointnet_config: the model config (architecture / condition /
        feature_mapper sections).
      x: (B, N, 3+) the x_t-branch cloud (e.g. complete shapes).
      condition: (B, M, 3+) the condition cloud (e.g. mirrored partials).
    """
    sf = float(pointnet_config.get("scale_factor", 1.0))
    arch = pointnet_config["architecture"]
    cond_arch = pointnet_config.get("condition_net_architecture", arch)
    mapper = pointnet_config.get("feature_mapper_architecture")

    x_l = _fps_ladder(jnp.asarray(x)[..., :3] / sf, arch["npoint"])
    c_l = _fps_ladder(jnp.asarray(condition)[..., :3] / sf, cond_arch["npoint"])

    sections = []

    def ladder(levels, a, name):
        stats = [
            _query_stats(levels[i], levels[i + 1], a["radius"][i], a["nsample"][i])
            for i in range(len(a["npoint"]))
        ]
        sections.append(report(stats, name))

    ladder(x_l, arch, "Input cloud SA_module")
    if pointnet_config.get("include_local_feature", True):
        ladder(c_l, cond_arch, "Condition cloud SA_module")
        if mapper is not None:
            enc = [
                _query_stats(c_l[i], x_l[i], mapper["encoder_radius"][i],
                             mapper["encoder_nsample"][i])
                for i in range(len(mapper["encoder_radius"]))
            ]
            sections.append(report(enc, "Encoder feature mapper (cond -> input)"))
            dec = [
                _query_stats(c_l[i], x_l[i], mapper["decoder_radius"][i],
                             mapper["decoder_nsample"][i])
                for i in range(len(mapper["decoder_radius"]))
            ]
            sections.append(report(dec, "Decoder feature mapper (cond -> input)"))
    return "\n".join(sections)


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
