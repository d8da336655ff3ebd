"""Parity tests for the TRANSPOSED windowed ball grouping
(ops/pallas_window.py: windowed_ball_group_t) against the lane-oriented
kernel: same selection math and bf16 roundings, so grouped features, counts,
and indices must match bit-for-bit in every tier (narrow/mid/wide)."""

import jax.numpy as jnp
import numpy as np
import pytest

from point_diffusion_refinement_tpu.ops.pallas_window import (
    build_query_ctx,
    build_support_ctx,
    build_support_ctx_t,
    windowed_ball_group,
    windowed_ball_group_t,
)

B, N, M, K = 2, 384, 512, 8
RADIUS = 0.25


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.default_rng(7)
    xyz = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
    xyz[0, :, 1] *= 3.0
    xyz[1, :, 0] *= 2.5
    q = rng.uniform(-1, 1, (B, M, 3)).astype(np.float32)
    q[0, :, 1] *= 3.0
    q[1, :, 0] *= 2.5
    fa = rng.normal(size=(B, N, 4)).astype(np.float32)
    fb = rng.normal(size=(B, N, 32)).astype(np.float32)
    return tuple(map(jnp.asarray, (xyz, q, fa, fb)))


def _pair(xyz, q, feats, window, **kw):
    sup = build_support_ctx(xyz, feats)
    sup_t = build_support_ctx_t(xyz, feats)
    qc = build_query_ctx(q, sup.axis_onehot)
    ref = windowed_ball_group(sup, qc, RADIUS, K, window=window,
                              interpret=True, **kw)
    out = windowed_ball_group_t(sup_t, qc, RADIUS, K, window=window,
                                interpret=True, **kw)
    return ref, out


class TestTransposedParity:
    @pytest.mark.parametrize("window", [128, 256, 512])
    def test_matches_lane_kernel(self, clouds, window):
        xyz, q, fa, fb = clouds
        ref, out = _pair(xyz, q, [fa, fb], window)
        assert len(out.grouped) == len(ref.grouped) == 2
        np.testing.assert_array_equal(
            np.array(out.counts), np.array(ref.counts)
        )
        np.testing.assert_array_equal(np.array(out.idx), np.array(ref.idx))
        for g_ref, g_out in zip(ref.grouped, out.grouped):
            assert g_out.shape == g_ref.shape
            assert g_out.dtype == jnp.bfloat16
            np.testing.assert_array_equal(
                np.array(g_out, np.float32), np.array(g_ref, np.float32)
            )

    @pytest.mark.parametrize("empty_mode", ["center_zero", "row0"])
    def test_empty_modes(self, clouds, empty_mode):
        xyz, q, fa, fb = clouds
        # shift queries so some balls are empty
        q = q + 2.0
        ref, out = _pair(xyz, q, [fa], 256, empty_mode=empty_mode)
        np.testing.assert_array_equal(
            np.array(out.counts), np.array(ref.counts)
        )
        np.testing.assert_array_equal(
            np.array(out.grouped[0], np.float32),
            np.array(ref.grouped[0], np.float32),
        )

    def test_include_center(self, clouds):
        xyz, q, fa, fb = clouds
        ref, out = _pair(xyz, q, [fb], 256, include_center=True)
        assert out.grouped[0].shape[-1] == fb.shape[-1] + 9
        np.testing.assert_array_equal(
            np.array(out.grouped[0], np.float32),
            np.array(ref.grouped[0], np.float32),
        )

    def test_wide_tier_cluster(self):
        # a dense slab no projection axis spreads: most tiles escalate,
        # exercising the sublane-cumsum wide path
        rng = np.random.default_rng(3)
        Np_ = 512
        xyz = rng.uniform(-0.02, 0.02, (1, Np_, 3)).astype(np.float32)
        xyz[:, :, 0] *= 50.0
        q = rng.uniform(-1, 1, (1, 256, 3)).astype(np.float32)
        q[:, :128] = xyz[:, :128] + 0.01
        feats = rng.normal(size=(1, Np_, 5)).astype(np.float32)
        ref, out = _pair(
            jnp.asarray(xyz), jnp.asarray(q), [jnp.asarray(feats)], 128
        )
        assert bool(out.fell_back)
        np.testing.assert_array_equal(
            np.array(out.counts), np.array(ref.counts)
        )
        np.testing.assert_array_equal(
            np.array(out.grouped[0], np.float32),
            np.array(ref.grouped[0], np.float32),
        )
