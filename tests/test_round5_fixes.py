"""Round-5 verdict/advice fixes.

Covers:
  * the FLOP classifier crossing pjit boundaries: one-hot gather einsums
    (ops/sampling.py::_group_points_onehot — jax.nn.one_hot and jnp.einsum
    are internally jit-wrapped) must classify as 'gather', not 'model'
    (VERDICT r4 item 5 / advisor r4 medium),
  * record_pallas_macs is a no-op outside a pallas_flops_tally scope
    (advisor r4 low),
  * f32 (compute_dtype != bfloat16) configs trace warning-free through the
    windowed-ft request — the fallback is configured intent, not a surprise
    (VERDICT r4 item 7 / advisor r4 low),
  * value + grad parity of the merged first-layer matmul (PDR_PACKED=1,
    default-off: measured net negative, STATUS.md round-5 ledger),
  * the FPS-with-coords kernel vs FPS + gather (bit-exact),
  * the MXU row gather vs the native gather,
  * the transposed windowed kNN kernel vs group_knn_features and vs the
    lane-major kernel (bit-exact).
"""

import copy
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from point_diffusion_refinement_tpu.config.loader import DEFAULT_POINTNET_CONFIG
from point_diffusion_refinement_tpu.models.condition_net import (
    PointNet2CloudCondition,
)
from point_diffusion_refinement_tpu.ops.sampling import _group_points_onehot
from point_diffusion_refinement_tpu.utils import flops as flops_mod
from point_diffusion_refinement_tpu.utils.flops import (
    dot_flops,
    pallas_flops_tally,
    record_pallas_macs,
)
from point_diffusion_refinement_tpu.utils.logging import reset_warn_once


class TestGatherFlopClassification:
    def test_onehot_gather_classifies_as_gather(self, rng_np):
        pts = jnp.asarray(rng_np.normal(size=(2, 64, 8)), jnp.float32)
        idx = jnp.asarray(
            rng_np.integers(0, 64, size=(2, 16, 4)), jnp.int32
        )
        for lossy in (False, True):
            out = dot_flops(
                lambda p, i: _group_points_onehot(p, i, lossy=lossy), pts, idx
            )
            assert out["gather"] > 0, out
            assert out["model"] == 0.0, out

    def test_model_matmul_stays_model(self, rng_np):
        a = jnp.asarray(rng_np.normal(size=(4, 8)), jnp.float32)
        b = jnp.asarray(rng_np.normal(size=(8, 8)), jnp.float32)
        out = dot_flops(lambda x, y: x @ y, a, b)
        assert out["model"] == 2.0 * 4 * 8 * 8
        assert out["gather"] == 0.0

    def test_mixed_graph_splits_buckets(self, rng_np):
        pts = jnp.asarray(rng_np.normal(size=(1, 32, 8)), jnp.float32)
        idx = jnp.asarray(rng_np.integers(0, 32, size=(1, 8, 4)), jnp.int32)
        w = jnp.asarray(rng_np.normal(size=(8, 16)), jnp.float32)

        def fn(p, i, w):
            g = _group_points_onehot(p, i, lossy=True)
            return g.astype(jnp.float32) @ w

        out = dot_flops(fn, pts, idx, w)
        assert out["gather"] > 0
        # the dense consumer of the gathered tensor is model work
        assert out["model"] == 2.0 * 1 * 8 * 4 * 8 * 16

    def test_scan_scales_gather_flops(self, rng_np):
        pts = jnp.asarray(rng_np.normal(size=(1, 32, 8)), jnp.float32)
        idx = jnp.asarray(rng_np.integers(0, 32, size=(1, 8, 4)), jnp.int32)

        def once(p, i):
            return _group_points_onehot(p, i, lossy=True).sum()

        def scanned(p, i):
            def body(c, _):
                return c + once(p, i), None

            out, _ = jax.lax.scan(body, 0.0, None, length=5)
            return out

        assert (
            dot_flops(scanned, pts, idx)["gather"]
            == 5 * dot_flops(once, pts, idx)["gather"]
        )


class TestPallasTallyScope:
    def test_record_outside_scope_is_noop(self):
        before = len(flops_mod._PALLAS_TALLY)
        record_pallas_macs(123.0)
        assert len(flops_mod._PALLAS_TALLY) == before

    def test_record_inside_scope_counts(self):
        with pallas_flops_tally() as out:
            record_pallas_macs(10.0)
        assert out["flops"] == 20.0
        # scope cleans up after itself
        assert len(flops_mod._PALLAS_TALLY) == 0


class TestPackedFirstLayers:
    """The merged first-layer matmul (ConditionedMLP first Dense + residual
    projection + AttentionPool key Dense fused into one contraction so the
    grouped tensor is read from HBM once) must match the unmerged path."""

    def test_full_model_packed_vs_unpacked(self, rng_np):
        import os

        from point_diffusion_refinement_tpu.config import tiny_pointnet_config

        pc = tiny_pointnet_config()
        model = PointNet2CloudCondition.from_config(pc)
        x = jnp.asarray(rng_np.normal(size=(2, 48, 3)), jnp.float32)
        cond = jnp.asarray(rng_np.normal(size=(2, 32, 4)), jnp.float32)
        ts = jnp.zeros((2,), jnp.float32)
        label = jnp.zeros((2,), jnp.int32)
        v = model.init(jax.random.PRNGKey(0), x, cond, ts, label)
        os.environ["PDR_PACKED"] = "1"  # packed is default-off (see STATUS)
        try:
            y_on = model.apply(v, x, cond, ts, label)
        finally:
            os.environ.pop("PDR_PACKED", None)
        y_off = model.apply(v, x, cond, ts, label)
        np.testing.assert_allclose(
            np.asarray(y_on), np.asarray(y_off), atol=2e-5, rtol=2e-4
        )

    def test_grad_parity_packed_vs_unpacked(self, rng_np):
        import os

        from point_diffusion_refinement_tpu.config import tiny_pointnet_config

        pc = tiny_pointnet_config()
        model = PointNet2CloudCondition.from_config(pc)
        x = jnp.asarray(rng_np.normal(size=(1, 48, 3)), jnp.float32)
        cond = jnp.asarray(rng_np.normal(size=(1, 32, 4)), jnp.float32)
        ts = jnp.zeros((1,), jnp.float32)
        label = jnp.zeros((1,), jnp.int32)
        v = model.init(jax.random.PRNGKey(0), x, cond, ts, label)

        def loss(v):
            return jnp.sum(model.apply(v, x, cond, ts, label) ** 2)

        os.environ["PDR_PACKED"] = "1"  # packed is default-off (see STATUS)
        try:
            g_on = jax.grad(loss)(v)
        finally:
            os.environ.pop("PDR_PACKED", None)
        g_off = jax.grad(loss)(v)
        flat_on = jax.tree_util.tree_leaves(g_on)
        flat_off = jax.tree_util.tree_leaves(g_off)
        # the packed matmul's ~1e-6 forward reduction-order noise amplifies
        # through GroupNorm-statistics gradients and the squared loss; the
        # measured envelope is <1% relative on a handful of elements with
        # everything else at f32 noise level — assert exactly that
        scale = max(float(jnp.abs(g).max()) for g in flat_off) + 1e-12
        for a, b in zip(flat_on, flat_off):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-3 * scale, rtol=2e-2
            )


class TestFpsWithCoords:
    def test_coords_match_fps_plus_gather(self, rng_np):
        from point_diffusion_refinement_tpu.ops.pallas_fps import (
            furthest_point_sample_pallas_coords,
        )
        from point_diffusion_refinement_tpu.ops.sampling import (
            furthest_point_sample_xla,
            gather_points,
        )

        xyz = jnp.asarray(rng_np.normal(size=(3, 256, 3)), jnp.float32)
        # add padding rows (|p|^2 <= 1e-3 never selected)
        xyz = xyz.at[:, 250:, :].set(0.0)
        idx, coords = furthest_point_sample_pallas_coords(
            xyz, 64, interpret=True
        )
        idx_ref = furthest_point_sample_xla(xyz, 64)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
        np.testing.assert_array_equal(
            np.asarray(coords), np.asarray(gather_points(xyz, idx_ref))
        )


class TestGatherRowsMxu:
    def test_matches_native_gather(self, rng_np):
        from point_diffusion_refinement_tpu.ops.sampling import (
            gather_points,
            gather_rows_mxu,
        )

        pts = jnp.asarray(rng_np.normal(size=(2, 64, 12)), jnp.float32)
        idx = jnp.asarray(rng_np.integers(0, 64, size=(2, 16)), jnp.int32)
        # CPU path falls back to the exact native gather
        out = gather_rows_mxu(pts, idx)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(gather_points(pts, idx))
        )


class TestF32RunsWarningFree:
    def test_f32_windowed_request_is_silent(self):
        pc = copy.deepcopy(dict(DEFAULT_POINTNET_CONFIG))
        pc.pop("compute_dtype", None)  # f32 by default
        model = PointNet2CloudCondition.from_config(pc)

        def build_and_run():
            x = jnp.zeros((1, 2048, 3), jnp.float32)
            cond = jnp.zeros((1, 3072, 4), jnp.float32)
            ts = jnp.zeros((1,), jnp.float32)
            label = jnp.zeros((1,), jnp.int32)
            variables = model.init(jax.random.PRNGKey(0), x, cond, ts, label)
            cf = model.apply(
                variables, cond, windowed_ft=True,
                method=model.encode_condition,
            )
            return model.apply(variables, x, ts, label, cf, method=model.denoise)

        reset_warn_once()
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            jax.eval_shape(build_and_run)
        hits = [
            str(w.message)
            for w in rec
            if w.category is UserWarning and "slower unfused" in str(w.message)
        ]
        assert not hits, hits


class TestTransposedWindowedKnn:
    """The transposed windowed kNN kernel must match group_knn_features
    (up to bf16 channel rounding) and the non-transposed windowed kernel
    exactly, in sorted-query order."""

    def test_matches_group_knn_features(self, rng_np):
        from point_diffusion_refinement_tpu.models.grouping import (
            group_knn_features,
        )
        from point_diffusion_refinement_tpu.ops.pallas_window import (
            build_query_ctx,
            build_support_ctx,
            build_support_ctx_t,
            sort_rows,
            windowed_knn_group,
        )

        B, N, M, C, k = 2, 1024, 256, 24, 8
        known = jnp.asarray(rng_np.uniform(-1, 1, (B, N, 3)), jnp.float32)
        feats = jnp.asarray(rng_np.normal(size=(B, N, C)), jnp.bfloat16)
        unknown = jnp.asarray(rng_np.uniform(-1, 1, (B, M, 3)), jnp.float32)

        sup_t = build_support_ctx_t(known, [feats], max_ct=256)
        qctx = build_query_ctx(unknown, sup_t.axis_onehot)
        out_t = windowed_knn_group(sup_t, qctx, k, interpret=True)

        # reference: exact kNN gather on the sorted queries
        ref = group_knn_features(
            qctx.xyz_sorted, known, feats, k, lossy_features=True
        )
        np.testing.assert_allclose(
            np.asarray(out_t, np.float32),
            np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2,  # bf16 channel rounding; d/w recomputed
        )

        # exact agreement with the non-transposed windowed kernel
        sup = build_support_ctx(known, [feats], max_ct=256)
        out_l = windowed_knn_group(sup, qctx, k, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out_t, np.float32), np.asarray(out_l, np.float32)
        )
