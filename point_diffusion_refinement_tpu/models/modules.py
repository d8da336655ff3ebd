"""PointNet++ network modules: set abstraction, feature propagation (3-NN and
kNN variants), and the feature-transfer (FT) module.

Reference: pointnet2_ops/pointnet2_modules.py:210-839.  All modules are
channels-last Flax modules whose input widths are inferred lazily, so the
reference's channel-arithmetic (mlp_spec[0] += 3 etc.) disappears — only the
output widths come from the config.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.interpolate import inverse_distance_weights, three_interpolate, three_nn
from ..ops.sampling import (
    furthest_point_sample_and_gather,
    gather_points,
    gather_rows_mxu,
)
from .attention import AttentionPool, GlobalSelfAttention
from .common import ConditionedMLP, pool_features
from .grouping import group_knn_features, query_and_group


def _packed_first_layers(
    parent: nn.Module,
    grouped,
    cm: ConditionedMLP,
    cm_name: str,
    ap_name,
    key_features: int,
    dtype,
    attention_bn: bool = True,
):
    """Merge the first-layer matmuls that each re-read the grouped tensor
    from HBM into ONE matmul.

    The (B, M, K, C) grouped tensor has exactly three dense consumers — the
    ConditionedMLP's first Dense, its residual projection, and the
    AttentionPool's key Dense (attention.py:35-57 `conv2`; Mlp_plus_t_emb's
    first conv and residual conv, pointnet2_modules.py:117-173).  XLA emits
    each as its own fusion with its own HBM read of the input (~20 MB per
    read at the level-0 shapes), so concatenating the kernels column-wise
    and slicing the outputs deletes two full reads per grouping site with
    bit-identical per-output arithmetic.

    Returns (first_pre, res_pre, key_pre, first_stats, key_stats) — the
    precomputed layer outputs plus their GroupNorm (sum, ssq) statistics —
    or None when the parameters are not available yet (init traces the
    unmerged path, which creates them) or the configuration doesn't match
    (bn_first / first_conv stacks).
    """
    import os

    # Default OFF — measured net NEGATIVE on v5e (B=4, shipped config):
    # merged 3.82 ms/step vs unmerged 3.69 (same tree, same session), and
    # 3.71 vs 3.60 in a second A/B.  The merge does delete two HBM reads of
    # the grouped tensor, but slicing the merged output breaks the
    # (value, GroupNorm-stats) multi-output epilogue fusion XLA gives the
    # separate key Dense (AttentionPool PGN_0 95 -> 183 us/step), and
    # forwarding precomputed stats from the packed site did not restore the
    # fusion (3.82 ms).  Kept as value/grad-parity-tested opt-in
    # infrastructure; see STATUS.md round-5 ledger.
    if os.environ.get("PDR_PACKED", "0") != "1":
        return None
    if cm.bn_first or cm.first_conv_features is not None:
        return None
    if parent.is_initializing():
        return None
    params = parent.variables.get("params", {})
    cm_params = params.get(cm_name)
    if cm_params is None:
        return None
    try:
        first = cm_params["SharedMLP_0"]["Dense_0"]
    except (KeyError, TypeError):
        return None
    C = grouped.shape[-1]
    w1 = first["kernel"]
    if w1.shape[0] != C:
        return None
    f0 = int(w1.shape[1])
    f_last = int(cm.features[-1])
    kernels = [w1]
    biases = [first.get("bias", jnp.zeros((f0,), jnp.float32))]
    widths = [f0]

    res_needed = cm.res_connect and C != f_last
    if res_needed:
        res = cm_params.get(cm.res_dense_name())
        if res is None or res["kernel"].shape != (C, f_last):
            return None
        kernels.append(res["kernel"])
        biases.append(res.get("bias", jnp.zeros((f_last,), jnp.float32)))
        widths.append(f_last)

    key_needed = ap_name is not None
    if key_needed:
        key = params.get(ap_name, {}).get("Dense_1")
        if key is None or key["kernel"].shape != (C, key_features):
            return None
        kernels.append(key["kernel"])
        biases.append(key["bias"])  # attention denses always carry a bias
        widths.append(key_features)

    if len(kernels) == 1:
        return None  # nothing to merge
    w_cat = jnp.concatenate(kernels, axis=1)
    b_cat = jnp.concatenate(biases, axis=0)
    g, w_cat, b_cat = nn.dtypes.promote_dtype(grouped, w_cat, b_cat, dtype=dtype)
    out = g @ w_cat + b_cat
    first_pre = out[..., : widths[0]]
    off = widths[0]
    res_pre = None
    if res_needed:
        res_pre = out[..., off : off + f_last]
        off += f_last
    key_pre = out[..., off:] if key_needed else None

    # GroupNorm statistics computed HERE, adjacent to the producing matmul,
    # so XLA multi-output-fuses the reduces into the dot's epilogue (the
    # separate Dense_1 used to get exactly this fusion; slicing the merged
    # output otherwise forces standalone stats re-read passes over the
    # (B, M, K, C) tensors).  Same math as the in-module reductions.
    spatial = tuple(range(1, out.ndim - 1))
    first_stats = None
    if cm.bn and not cm.bn_first:
        h32 = first_pre.astype(jnp.float32)
        first_stats = (
            jnp.sum(h32, axis=spatial),
            jnp.sum(jnp.square(h32), axis=spatial),
        )
    key_stats = None
    if key_needed and attention_bn:
        hk32 = jnp.maximum(key_pre, 0.0).astype(jnp.float32)
        key_stats = (
            jnp.sum(hk32, axis=spatial),
            jnp.sum(jnp.square(hk32), axis=spatial),
        )
    return first_pre, res_pre, key_pre, first_stats, key_stats


def _sow_count_hist(mod: nn.Module, counts, nsample: int) -> None:
    """Record this forward's neighbor counts into the 'neighbor_stats'
    collection as a (nsample+1,) histogram.

    Per-forward instrumentation matching record_neighbor_stats
    (pointnet2_utils.py:423-428): the reference snapshots min/mean/max +
    quantiles of the latest batch on the module; here each forward sows an
    exact count histogram, and the caller accumulates histograms across
    forwards (utils/neighbor_stats.NeighborStatsAccumulator) so the report
    reflects the full augmented data distribution, not one batch.  A no-op
    unless apply() is called with mutable=['neighbor_stats'] (so the hot
    path stays instrumentation-free) and skipped for kNN groupers, which
    carry counts='all' like the reference (pointnet2_utils.py:433-435).
    """
    if counts is None or isinstance(counts, str) or mod.is_initializing():
        return
    import jax

    c = jnp.clip(counts, 0, nsample)
    hist = jnp.sum(
        jax.nn.one_hot(c, nsample + 1, dtype=jnp.float32), axis=(0, 1)
    )
    mod.sow("neighbor_stats", "count_hist", hist)


class SetAbstraction(nn.Module):
    """FPS -> ball-query/kNN grouping -> conditioned MLP -> attention pool or
    max/avg pool; optional global self-attention over the downsampled set.

    Reference: _PointnetSAModuleBase.forward (pointnet2_modules.py:220-280)
    with the single-scale PointnetSAModule wiring (:396-442).
    """

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]  # reference mlp_spec[1:]
    include_t: bool = False
    include_condition: bool = False
    include_second_condition: bool = False
    use_xyz: bool = True
    include_abs_coordinate: bool = False
    include_center_coordinate: bool = False
    bn: bool = True
    bn_first: bool = False
    bias: bool = False
    res_connect: bool = False
    first_conv_features: Optional[int] = None
    neighbor_def: str = "radius"
    activation: str = "relu"
    use_attention: bool = False
    attention_bn: bool = True
    attention_transform_out: bool = True
    attention_last_activation: bool = True
    use_global_attention: bool = False
    global_attention_bn: bool = True
    global_attention_last_activation: bool = True
    dtype: object = None
    record_neighbor_stats: bool = False

    def _windowed_eligible(self, xyz, features, windowed: bool) -> bool:
        """Inference-only windowed fused ball-query+gather for the x_t-branch
        SA grouping (ops/pallas_window.py).  The x_t cloud is near-gaussian
        for most reverse steps, so its projected density windows well — the
        opposite of the surface-shaped condition cloud.  The kernel needs
        the [features, rel, abs(, center)] layout (use_xyz +
        include_abs_coordinate), bf16 compute, radius neighborhoods, and
        128-aligned query counts; anything else keeps the unfused path.

        When the caller requested the fast path (windowed=True) and a
        non-size predicate fails, a one-shot trace-time warning names it —
        size floors (cloud < 1024 points) stay silent because the coarse
        levels of the shipped config fall back by design."""
        import os

        if not (windowed and os.environ.get("PDR_WINDOWED_SA", "1") != "0"):
            return False
        if xyz.shape[1] < 1024 or features is None:
            return False  # size floor / no features: silent by-design fallback
        if self.dtype is None:
            # f32 compute is a configured choice: silent fallback (warning on
            # every intentionally-f32 run would be tuned out, VERDICT r4 #6)
            return False
        failed = []
        if self.neighbor_def != "radius":
            failed.append(f"neighbor_def={self.neighbor_def!r} (need 'radius')")
        if not (self.use_xyz and self.include_abs_coordinate):
            failed.append("use_xyz/include_abs_coordinate off")
        if self.npoint % 128 != 0:
            failed.append(f"npoint={self.npoint} not a multiple of 128")
        if failed:
            from ..utils.logging import warn_once

            warn_once(
                f"sa-windowed:{self.name}:{';'.join(failed)}",
                f"SetAbstraction {self.name}: windowed fast path ineligible "
                f"({'; '.join(failed)}); using the ~2x slower unfused "
                "grouping path",
            )
            return False
        return True

    def _train_windowed_eligible(self, xyz, features) -> bool:
        """Opt-in (PDR_WINDOWED_TRAIN=1) differentiable windowed grouping for
        the TRAIN step (ops/windowed_grad.py custom VJP — the backward is the
        transposed one-hot scatter the reference implements with atomic adds,
        group_points_gpu.cu:43-64)."""
        import os

        return (
            os.environ.get("PDR_WINDOWED_TRAIN") == "1"
            and self.neighbor_def == "radius"
            and features is not None
            and 8 + features.shape[-1] <= 128  # packed-table lane budget
            and self.use_xyz
            and self.include_abs_coordinate
            and self.dtype is not None
            and xyz.shape[1] >= 1024
            and self.npoint % 128 == 0
        )

    @nn.compact
    def __call__(
        self,
        xyz,
        features,
        t_emb=None,
        condition_emb=None,
        second_condition_emb=None,
        pooling: str = "max",
        windowed: bool = False,
        fps_ordered: bool = False,
    ):
        if fps_ordered:
            # The input cloud is already in FPS *selection order* (it is the
            # previous SA level's ``new_xyz``).  Greedy FPS is prefix-stable:
            # with the same start (idx[0] = 0) the j-th pick over the subset
            # S = FPS(X, n1) equals the j-th pick over X (the X-maximizer is
            # in S and ties resolve to the lowest index, which is the
            # earliest-selected = same point).  So FPS on S degenerates to
            # the identity prefix — verified exactly (incl. duplicate-point
            # ties) against the Pallas kernel in tests/test_ops_geometry.py.
            # This deletes the npoint sequential argmax iterations per level
            # (~0.4 us each at their latency floor) for every SA level > 0.
            fps_idx = jnp.broadcast_to(
                jnp.arange(self.npoint, dtype=jnp.int32)[None],
                (xyz.shape[0], self.npoint),
            )
            new_xyz = xyz[:, : self.npoint]
        else:
            # one fused kernel: FPS + exact coordinate emission (the XLA-side
            # row gather of the centers is a ~27 us kLoop at (4, 2048))
            fps_idx, new_xyz = furthest_point_sample_and_gather(xyz, self.npoint)

        qctx = None
        if not windowed and self._train_windowed_eligible(xyz, features):
            import jax

            from ..ops.windowed_grad import (
                _LightQueryOrder,
                windowed_group_train,
            )

            grouped, counts, _idx, order, inv = windowed_group_train(
                xyz, features, new_xyz, self.radius, self.nsample,
                self.include_center_coordinate, "row0",
                jax.default_backend() != "tpu",
            )
            qctx = _LightQueryOrder(order=order, inv_order=inv)
        elif self._windowed_eligible(xyz, features, windowed):
            import jax

            from ..ops.pallas_window import (
                build_query_ctx,
                build_support_ctx_auto,
                windowed_ball_group,
            )

            sup = build_support_ctx_auto(xyz, [features])
            if sup is not None:
                qctx = build_query_ctx(new_xyz, sup.axis_onehot)
                wg = windowed_ball_group(
                    sup, qctx, self.radius, self.nsample,
                    include_center=self.include_center_coordinate,
                    empty_mode="row0",
                    interpret=jax.default_backend() != "tpu",
                    emit_idx=False,  # inference never reads neighbor indices
                )
                # sorted-query order from here on: the MLP is pointwise and
                # the GroupNorm/attention statistics are permutation-
                # invariant over centers, so only the pooled output needs
                # unsorting (cheap (B, M, C) gather)
                grouped, counts = wg.grouped[0], wg.counts
        if qctx is None:
            grouped, counts = query_and_group(
                xyz,
                new_xyz,
                features,
                radius=self.radius,
                nsample=self.nsample,
                neighbor_def=self.neighbor_def,
                use_xyz=self.use_xyz,
                include_abs_coordinate=self.include_abs_coordinate,
                include_center_coordinate=self.include_center_coordinate,
                subset=True,
                lossy_features=self.dtype is not None,
            )
        if self.record_neighbor_stats:
            _sow_count_hist(self, counts, self.nsample)
        cm = ConditionedMLP(
            tuple(self.mlp),
            include_t=self.include_t,
            include_condition=self.include_condition,
            include_second_condition=self.include_second_condition,
            bn=self.bn,
            bn_first=self.bn_first,
            bias=self.bias,
            first_conv_features=self.first_conv_features,
            res_connect=self.res_connect,
            activation=self.activation,
            dtype=self.dtype,
            fused=windowed,  # windowed => inference (kernels have no VJP)
        )
        packed = _packed_first_layers(
            self, grouped, cm, "ConditionedMLP_0",
            "AttentionPool_0" if self.use_attention else None,
            max(grouped.shape[-1], 32), self.dtype,
            attention_bn=self.attention_bn,
        )
        first_pre, res_pre, key_pre, first_stats, key_stats = (
            packed if packed is not None else (None,) * 5
        )
        out = cm(
            grouped,
            t_emb=t_emb if self.include_t else None,
            condition_emb=condition_emb if self.include_condition else None,
            second_condition_emb=(
                second_condition_emb if self.include_second_condition else None
            ),
            first_pre=first_pre,
            res_pre=res_pre,
            first_stats=first_stats,
        )
        if self.use_attention:
            if fps_ordered:
                query = features[:, : self.npoint]  # features at new_xyz
            else:
                # query feeds the bf16 attention Dense: the lossy one-hot MXU
                # gather is value-identical to gather-then-promote and ~9x
                # faster than the XLA kLoop row gather at (4, 2048, C)
                if self.dtype is not None:
                    query = gather_rows_mxu(features, fps_idx, lossy=True)
                else:
                    query = gather_points(features, fps_idx)
            if qctx is not None:
                from ..ops.pallas_window import sort_rows

                if self.dtype is not None:
                    query = query.astype(self.dtype)
                query = sort_rows(query, qctx)
            new_features = AttentionPool(
                self.mlp[-1],
                attention_bn=self.attention_bn,
                transform_grouped_feat_out=self.attention_transform_out,
                last_activation=self.attention_last_activation,
                dtype=self.dtype,
            )(query, grouped, out, counts, fused=windowed, key_pre=key_pre,
              key_stats=key_stats)
        else:
            new_features = pool_features(out, counts, pooling)
        if qctx is not None:
            from ..ops.pallas_window import unsort_rows

            new_features = unsort_rows(new_features, qctx)

        if self.use_global_attention:
            cat = jnp.concatenate([new_features, new_xyz], axis=-1)
            new_features = GlobalSelfAttention(
                self.mlp[-1],
                attention_bn=self.global_attention_bn,
                last_activation=self.global_attention_last_activation,
            )(cat)
        # INVARIANT: new_xyz is returned in FPS *selection order* and must
        # never be permuted (e.g. into sorted-query order like new_features
        # transiently is) — the next SA level's fps_ordered=True treats its
        # input as an FPS sample with the identity prefix, which silently
        # degrades to arbitrary subsampling if this order changes.  Guarded
        # by tests/test_round4_fixes.py::TestFpsOrderedInvariant.
        return new_xyz, new_features


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance interpolation + skip concat + conditioned MLP.

    Reference: PointnetFPModule (pointnet2_modules.py:445-576).
    """

    mlp: Sequence[int]
    include_t: bool = False
    include_condition: bool = False
    include_second_condition: bool = False
    bn: bool = True
    bn_first: bool = False
    bias: bool = False
    res_connect: bool = False
    first_conv_features: Optional[int] = None
    include_grouper: bool = False
    radius: float = 0.0
    nsample: int = 32
    use_xyz: bool = True
    include_abs_coordinate: bool = True
    include_center_coordinate: bool = False
    neighbor_def: str = "radius"
    activation: str = "relu"
    dtype: object = None
    record_neighbor_stats: bool = False

    @nn.compact
    def __call__(
        self,
        unknown,
        known,
        unknown_feats,
        known_feats,
        t_emb=None,
        condition_emb=None,
        second_condition_emb=None,
        pooling: str = "max",
    ):
        if known is not None:
            dist, idx = three_nn(unknown, known)
            weight = inverse_distance_weights(dist)
            interpolated = three_interpolate(known_feats, idx, weight)
        else:
            interpolated = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1], known_feats.shape[-1])
            )

        if unknown_feats is not None:
            new_features = jnp.concatenate([interpolated, unknown_feats], axis=-1)
        else:
            new_features = interpolated

        counts = None
        if self.include_grouper:
            grouped, counts = query_and_group(
                unknown,
                unknown,
                new_features,
                radius=self.radius,
                nsample=self.nsample,
                neighbor_def=self.neighbor_def,
                use_xyz=self.use_xyz,
                include_abs_coordinate=self.include_abs_coordinate,
                include_center_coordinate=self.include_center_coordinate,
                subset=True,
            )
            if self.record_neighbor_stats:
                _sow_count_hist(self, counts, self.nsample)
            h = grouped
        else:
            h = new_features[:, :, None, :]  # K = 1

        h = ConditionedMLP(
            tuple(self.mlp),
            include_t=self.include_t,
            include_condition=self.include_condition,
            include_second_condition=self.include_second_condition,
            bn=self.bn,
            bn_first=self.bn_first,
            bias=self.bias,
            first_conv_features=self.first_conv_features,
            res_connect=self.res_connect,
            activation=self.activation,
            dtype=self.dtype,
        )(
            h,
            t_emb=t_emb if self.include_t else None,
            condition_emb=condition_emb if self.include_condition else None,
            second_condition_emb=(
                second_condition_emb if self.include_second_condition else None
            ),
        )
        if self.include_grouper:
            return pool_features(h, counts, pooling)
        return h[:, :, 0, :]


class KnnFeaturePropagation(nn.Module):
    """kNN-based feature propagation — the FP variant the shipped configs use
    (use_knn_FP: true, K: 8).

    Reference: PointnetKnnFPModule (pointnet2_modules.py:652-839):
    group_knn (+11 pos/dist channels) -> mlp1 (+class condition) -> attention
    (query = skip features) or pool -> concat skip + xyz -> mlp2 (+t, +global
    condition) -> optional global self-attention.
    """

    mlp1: Sequence[int]
    mlp2: Sequence[int]
    k: int
    include_t: bool = False
    include_condition: bool = False  # global-feature condition, into mlp2
    include_second_condition: bool = False  # class condition, into mlp1
    bn: bool = True
    bn_first: bool = False
    bias: bool = False
    res_connect: bool = False
    include_grouper: bool = False
    radius: float = 0.0
    nsample: int = 32
    use_xyz: bool = True
    include_abs_coordinate: bool = True
    include_center_coordinate: bool = False
    neighbor_def: str = "radius"
    activation: str = "relu"
    use_attention: bool = False
    attention_bn: bool = True
    attention_transform_out: bool = True
    attention_last_activation: bool = True
    use_global_attention: bool = False
    global_attention_bn: bool = True
    global_attention_last_activation: bool = True
    dtype: object = None
    record_neighbor_stats: bool = False

    def _windowed_eligible(self, unknown, known, known_feats,
                           windowed: bool) -> bool:
        """Inference-only fused windowed kNN+gather (ops/pallas_window.py).
        Support = the coarser x_t level — it changes per step, so unlike the
        FT supports the sort + packed-table build are per-call.  Measured on
        v5e (B=4, FP-0 2048x1024 K=8): the fused kernel itself only breaks
        even with the exact kNN + one-hot gather pair (0.35 ms) at W=512,
        and the per-step support build pushes it net negative — so this
        path is OFF by default and kept as opt-in (PDR_WINDOWED_KNNFP=1)
        infrastructure for shapes where the support is larger or reused."""
        import os

        return (
            windowed
            and bool(os.environ.get("PDR_WINDOWED_KNNFP"))
            and known is not None
            and known_feats is not None
            and self.dtype is not None
            and not self.include_grouper
            and known.shape[1] >= 1024
            and unknown.shape[1] % 128 == 0
            and self.k <= known.shape[1]
        )

    @nn.compact
    def __call__(
        self,
        unknown,
        known,
        unknown_feats,
        known_feats,
        t_emb=None,
        condition_emb=None,
        second_condition_emb=None,
        pooling: str = "max",
        windowed: bool = False,
    ):
        if self.use_attention or self.use_global_attention:
            assert known is not None and unknown is not None
            if self.use_global_attention:
                assert not self.include_grouper

        qctx = None
        unknown_orig = unknown
        if self._windowed_eligible(unknown, known, known_feats, windowed):
            import jax

            from ..ops.pallas_window import (
                build_query_ctx,
                build_support_ctx_auto,
                sort_rows,
                windowed_knn_group,
            )

            sup = build_support_ctx_auto(known, [known_feats], max_ct=256)
            if sup is not None:
                qctx = build_query_ctx(unknown, sup.axis_onehot)
                grouped = windowed_knn_group(
                    sup, qctx, self.k,
                    interpret=jax.default_backend() != "tpu",
                )
                # sorted-query order from here to the post-mlp2 unsort
                unknown = qctx.xyz_sorted
                if unknown_feats is not None:
                    unknown_feats = sort_rows(unknown_feats, qctx)
        if known is not None:
            if qctx is None:
                k = min(self.k, known.shape[1])
                grouped = group_knn_features(
                    unknown, known, known_feats, k,
                    lossy_features=self.dtype is not None,
                )
            cm1 = ConditionedMLP(
                tuple(self.mlp1),
                include_t=False,
                include_condition=self.include_second_condition,
                bn=self.bn,
                bn_first=self.bn_first,
                bias=self.bias,
                res_connect=self.res_connect,
                activation=self.activation,
                dtype=self.dtype,
                fused=windowed,  # inference marker (kernels have no VJP)
            )
            packed = _packed_first_layers(
                self, grouped, cm1, "ConditionedMLP_0",
                "AttentionPool_0" if self.use_attention else None,
                max(grouped.shape[-1], 32), self.dtype,
                attention_bn=self.attention_bn,
            )
            first_pre, res_pre, key_pre, first_stats, key_stats = (
                packed if packed is not None else (None,) * 5
            )
            out1 = cm1(
                grouped,
                condition_emb=(
                    second_condition_emb if self.include_second_condition else None
                ),
                first_pre=first_pre,
                res_pre=res_pre,
                first_stats=first_stats,
            )
            if self.use_attention:
                interpolated = AttentionPool(
                    self.mlp1[-1],
                    attention_bn=self.attention_bn,
                    transform_grouped_feat_out=self.attention_transform_out,
                    last_activation=self.attention_last_activation,
                    dtype=self.dtype,
                )(unknown_feats, grouped, out1, "all", fused=windowed,
                  key_pre=key_pre, key_stats=key_stats)
            else:
                interpolated = pool_features(out1, "all", pooling)
        else:
            interpolated = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1], known_feats.shape[-1])
            )

        if self.dtype is not None:
            # mlp2's Dense promotes its input to the compute dtype anyway;
            # casting the concat PARTS first keeps the (B, M, C1+C2+3)
            # skip-concat in bf16 instead of promoting everything to f32
            # (identical values, half the concat bytes)
            interpolated = interpolated.astype(self.dtype)
            if unknown_feats is not None:
                unknown_feats = unknown_feats.astype(self.dtype)
        if unknown_feats is not None:
            new_features = jnp.concatenate([interpolated, unknown_feats], axis=-1)
        else:
            new_features = interpolated

        counts = None
        if self.include_grouper:
            grouped2, counts = query_and_group(
                unknown,
                unknown,
                new_features,
                radius=self.radius,
                nsample=self.nsample,
                neighbor_def=self.neighbor_def,
                use_xyz=self.use_xyz,
                include_abs_coordinate=self.include_abs_coordinate,
                include_center_coordinate=self.include_center_coordinate,
                subset=True,
            )
            if self.record_neighbor_stats:
                _sow_count_hist(self, counts, self.nsample)
            h = grouped2
        else:
            pos = unknown.astype(self.dtype) if self.dtype is not None else unknown
            new_features = jnp.concatenate([new_features, pos], axis=-1)
            h = new_features[:, :, None, :]

        h = ConditionedMLP(
            tuple(self.mlp2),
            include_t=self.include_t,
            include_condition=self.include_condition,
            bn=self.bn,
            bn_first=self.bn_first,
            bias=self.bias,
            res_connect=self.res_connect,
            activation=self.activation,
            dtype=self.dtype,
            fused=windowed,  # inference marker (kernels have no VJP)
        )(
            h,
            t_emb=t_emb if self.include_t else None,
            condition_emb=condition_emb if self.include_condition else None,
        )
        if self.include_grouper:
            return pool_features(h, counts, pooling)
        h = h[:, :, 0, :]
        if qctx is not None:
            from ..ops.pallas_window import unsort_rows

            h = unsort_rows(h, qctx)
        if self.use_global_attention:
            cat = jnp.concatenate([h, unknown_orig], axis=-1)
            h = GlobalSelfAttention(
                self.mlp2[-1],
                attention_bn=self.global_attention_bn,
                last_activation=self.global_attention_last_activation,
            )(cat)
        return h


class FeatureTransfer(nn.Module):
    """Feature Transfer (FT) module: map condition-branch features onto the
    noisy-branch positions.

    Reference: FeatureMapModule (pointnet2_modules.py:579-649): QueryAndGroup
    with subset=False (self-substitute + zero features for empty balls) ->
    MLP -> attention pool with query = features already at the target points.
    """

    mlp: Sequence[int]
    radius: float
    k: int
    use_xyz: bool = True
    include_abs_coordinate: bool = True
    include_center_coordinate: bool = False
    bn: bool = True
    bn_first: bool = True
    bias: bool = True
    res_connect: bool = True
    first_conv_features: Optional[int] = None
    neighbor_def: str = "radius"
    activation: str = "relu"
    use_attention: bool = False
    attention_bn: bool = True
    attention_transform_out: bool = True
    attention_last_activation: bool = True
    dtype: object = None
    record_neighbor_stats: bool = False

    @nn.compact
    def __call__(
        self,
        xyz,
        features,
        new_xyz,
        query_feats=None,
        subset: bool = False,
        pooling: str = "max",
        pregrouped=None,
        fused: bool = False,
    ):
        if pregrouped is not None:
            # (grouped, counts, query_ctx) from the windowed fused kernel
            # (ops/pallas_window.py) — grouped is in sorted-query order with
            # the same channel layout query_and_group would produce; run the
            # per-center MLP + pooling in that order and unsort at the end.
            from ..ops.pallas_window import sort_rows, unsort_rows

            grouped, counts, qctx = pregrouped
            if query_feats is not None:
                if self.dtype is not None:
                    # the attention query Dense promotes to the compute dtype
                    # anyway; casting BEFORE the permutation turns an XLA
                    # kLoop f32 gather (~32 us at (4, 2048, C)) into the
                    # exact one-hot MXU permutation — identical values
                    query_feats = query_feats.astype(self.dtype)
                query_feats = sort_rows(query_feats, qctx)
        else:
            grouped, counts = query_and_group(
                xyz,
                new_xyz,
                features,
                radius=self.radius,
                nsample=self.k,
                neighbor_def=self.neighbor_def,
                use_xyz=self.use_xyz,
                include_abs_coordinate=self.include_abs_coordinate,
                include_center_coordinate=self.include_center_coordinate,
                subset=subset,
                lossy_features=self.dtype is not None,
            )
        if self.record_neighbor_stats:
            _sow_count_hist(self, counts, self.k)
        cm = ConditionedMLP(
            tuple(self.mlp),
            include_t=False,
            include_condition=False,
            bn=self.bn,
            bn_first=self.bn_first,
            bias=self.bias,
            first_conv_features=self.first_conv_features,
            res_connect=self.res_connect,
            activation=self.activation,
            dtype=self.dtype,
            fused=fused,  # inference marker (kernels have no VJP)
        )
        packed = _packed_first_layers(
            self, grouped, cm, "ConditionedMLP_0",
            "AttentionPool_0" if self.use_attention else None,
            max(grouped.shape[-1], 32), self.dtype,
            attention_bn=self.attention_bn,
        )
        first_pre, res_pre, key_pre, first_stats, key_stats = (
            packed if packed is not None else (None,) * 5
        )
        out = cm(grouped, first_pre=first_pre, res_pre=res_pre,
                 first_stats=first_stats)
        if self.use_attention:
            assert query_feats is not None
            pooled = AttentionPool(
                self.mlp[-1],
                attention_bn=self.attention_bn,
                transform_grouped_feat_out=self.attention_transform_out,
                last_activation=self.attention_last_activation,
                dtype=self.dtype,
            )(query_feats, grouped, out, counts, fused=fused, key_pre=key_pre,
              key_stats=key_stats)
        else:
            pooled = pool_features(out, counts, pooling)
        if pregrouped is not None:
            from ..ops.pallas_window import unsort_rows

            pooled = unsort_rows(pooled, pregrouped[2])
        return pooled
