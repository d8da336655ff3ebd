"""Pallas kernels vs the XLA reference implementations (interpret mode on
CPU; on-device parity is exercised by the TPU bench/driver)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_diffusion_refinement_tpu.ops.neighbors import ball_query_xla, knn_xla
from point_diffusion_refinement_tpu.ops.sampling import furthest_point_sample_xla
from point_diffusion_refinement_tpu.ops.pallas_fps import furthest_point_sample_pallas
from point_diffusion_refinement_tpu.ops.pallas_neighbors import (
    ball_query_pallas,
    knn_pallas,
)


@pytest.fixture
def clouds(rng_np):
    x = jnp.asarray(rng_np.uniform(-1, 1, (2, 300, 3)).astype(np.float32))
    c = jnp.asarray(rng_np.uniform(-1, 1, (2, 70, 3)).astype(np.float32))
    return x, c


class TestPallasBallQuery:
    def test_parity(self, clouds):
        x, c = clouds
        i1, n1 = ball_query_xla(x, c, 0.4, 16)
        i2, n2 = ball_query_pallas(x, c, 0.4, 16, interpret=True)
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_empty_and_overfull(self, rng_np):
        x = jnp.asarray(rng_np.uniform(-0.05, 0.05, (1, 64, 3)).astype(np.float32))
        c = jnp.concatenate([x[:, :4], jnp.ones((1, 2, 3)) * 5], axis=1)
        i1, n1 = ball_query_xla(x, c, 0.2, 8)
        i2, n2 = ball_query_pallas(x, c, 0.2, 8, interpret=True)
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        assert np.asarray(n2)[0, -1] == 0  # far center: empty ball

    def test_k_exceeds_n(self, rng_np):
        x = jnp.asarray(rng_np.uniform(-1, 1, (1, 12, 3)).astype(np.float32))
        c = x[:, :3]
        i1, n1 = ball_query_xla(x, c, 3.0, 32)
        i2, n2 = ball_query_pallas(x, c, 3.0, 32, interpret=True)
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


class TestPallasKnn:
    def test_parity(self, clouds):
        x, c = clouds
        d1, i1 = knn_xla(c, x, 8)
        d2, i2 = knn_pallas(c, x, 8, interpret=True)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5, atol=1e-6)


class TestPallasFPS:
    def test_parity(self, clouds):
        x, _ = clouds
        a = np.asarray(furthest_point_sample_xla(x, 64))
        b = np.asarray(furthest_point_sample_pallas(x, 64, interpret=True))
        np.testing.assert_array_equal(a, b)

    def test_stacked_extract_parity(self, clouds, rng_np):
        # opt-in stacked-extract variant (PDR_FPS_STACKED): one masked max
        # over a (3B, N) slab instead of three over (B, N).  Measured mixed
        # on v5e (1.10x at N=2048, 0.77x at N=3072, 0.55x at N=1024) so off
        # by default, but must stay bit-identical.
        from point_diffusion_refinement_tpu.ops.pallas_fps import _fps_pallas_impl

        x, _ = clouds
        a = np.asarray(furthest_point_sample_xla(x, 64))
        b = np.asarray(_fps_pallas_impl(x, 64, True, True))
        np.testing.assert_array_equal(a, b)
        y = rng_np.uniform(0.5, 1.5, (2, 40, 3)).astype(np.float32)
        y[:, 30:] = 0.0  # padding rows must never be selected
        idx = np.asarray(_fps_pallas_impl(jnp.asarray(y), 16, True, True))
        assert (idx[:, 1:] < 30).all()

    def test_padding_skip(self, rng_np):
        x = rng_np.uniform(0.5, 1.5, (1, 40, 3)).astype(np.float32)
        x[:, 30:] = 0.0
        idx = np.asarray(
            furthest_point_sample_pallas(jnp.asarray(x), 16, interpret=True)
        )
        assert (idx[:, 1:] < 30).all()


class TestSizeEnvelope:
    """Grid tiling keeps the VMEM working set bounded at the refine+upsample
    shapes (B=64 / N=16384); parity must hold across tile boundaries and the
    dispatcher must fall back to XLA instead of Mosaic-erroring beyond the
    envelope (VERDICT round 1, item 7)."""

    def test_fps_batch_tiling_parity(self, rng_np):
        from point_diffusion_refinement_tpu.ops.pallas_fps import fps_batch_tile

        # N large enough that the batch is split into multiple grid steps
        # (and B not a tile multiple, exercising batch padding)
        B, N = 20, 16384
        assert fps_batch_tile(B, N) < B
        x = rng_np.uniform(-1, 1, (B, N, 3)).astype(np.float32)
        x[:, -37:, :] = 0.0  # padding rows must never be selected
        a = np.asarray(furthest_point_sample_xla(jnp.asarray(x), 48))
        b = np.asarray(
            furthest_point_sample_pallas(jnp.asarray(x), 48, interpret=True)
        )
        np.testing.assert_array_equal(a, b)

    def test_ball_query_adaptive_tile_parity(self, rng_np):
        from point_diffusion_refinement_tpu.ops.pallas_neighbors import row_tile

        # tile shrinks to 128 at N=4096 (empirical VMEM envelope); parity
        # must hold across the smaller tile boundaries
        B, N, M = 1, 4096, 200
        assert row_tile(M, N) == 128
        x = jnp.asarray(rng_np.uniform(-1, 1, (B, N, 3)).astype(np.float32))
        c = jnp.asarray(rng_np.uniform(-1, 1, (B, M, 3)).astype(np.float32))
        i1, n1 = ball_query_xla(x, c, 0.15, 16)
        i2, n2 = ball_query_pallas(x, c, 0.15, 16, interpret=True)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))

    def test_knn_adaptive_tile_parity(self, rng_np):
        x = jnp.asarray(rng_np.uniform(-1, 1, (1, 4096, 3)).astype(np.float32))
        c = jnp.asarray(rng_np.uniform(-1, 1, (1, 200, 3)).astype(np.float32))
        d1, i1 = knn_xla(c, x, 8)
        d2, i2 = knn_pallas(c, x, 8, interpret=True)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)

    def test_dispatcher_falls_back_beyond_envelope(self, monkeypatch, rng_np):
        """With Pallas force-enabled, shapes beyond the VMEM envelope
        (empirically: 128-row tiles at N=16384 fail to compile on v5e) must
        route to XLA — no Mosaic compile attempt — and stay correct."""
        from point_diffusion_refinement_tpu.ops import neighbors, sampling
        from point_diffusion_refinement_tpu.ops.pallas_neighbors import row_tile

        assert row_tile(2048, 16384) is None
        assert row_tile(256, 16384) is None
        # tiny-M single tiles still fit even at large N
        assert row_tile(8, 16384) == 8
        monkeypatch.setattr(sampling, "_use_pallas", lambda: True)
        N = 16384
        x = jnp.asarray(rng_np.uniform(-1, 1, (1, N, 3)).astype(np.float32))
        c = jnp.asarray(rng_np.uniform(-1, 1, (1, 256, 3)).astype(np.float32))
        i1, n1 = neighbors.ball_query(x, c, 0.1, 4)
        i2, n2 = ball_query_xla(x, c, 0.1, 4)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


class TestFusedBallQueryGather:
    """ball_query_group_pallas: gathered rows must equal table[idx] (to the
    hi/lo bf16 split's ~16 mantissa bits, the same precision as the one-hot
    MXU gather it replaces) for the reference ball-query idx (repeat-first
    padding, row 0 on empty balls); the index itself reconstructs exactly
    from the lane column."""

    def test_matches_ball_query_plus_gather(self, rng_np):
        from point_diffusion_refinement_tpu.ops.pallas_neighbors import (
            ball_query_group_pallas,
        )

        B, N, M, K, C = 2, 300, 170, 8, 37
        x = jnp.asarray(rng_np.uniform(-1, 1, (B, N, 3)).astype(np.float32))
        c = jnp.asarray(rng_np.uniform(-1, 1, (B, M, 3)).astype(np.float32))
        table = jnp.asarray(rng_np.uniform(-9, 9, (B, N, C)).astype(np.float32))
        # radius chosen so some balls are empty and some overfull
        g, idx, cnt = ball_query_group_pallas(x, c, table, 0.3, K, True)
        i_ref, n_ref = ball_query_xla(x, c, 0.3, K)
        assert (np.asarray(n_ref) == 0).any() and (np.asarray(n_ref) == K).any()
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(i_ref))
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(n_ref))
        expect = np.take_along_axis(
            np.asarray(table)[:, :, None, :].repeat(M, 2).transpose(0, 2, 1, 3),
            np.asarray(i_ref)[..., None].repeat(C, -1),
            axis=2,
        )
        np.testing.assert_allclose(np.asarray(g), expect, rtol=2e-5, atol=2e-4)

    def test_query_and_group_fused_equals_unfused(self, monkeypatch, rng_np):
        """The fused dispatch inside query_and_group must be value-identical
        to the unfused XLA path (subset=False FT semantics included)."""
        from point_diffusion_refinement_tpu.models import grouping
        from point_diffusion_refinement_tpu.ops import sampling

        B, N, M, K, C = 2, 200, 60, 8, 5
        x = jnp.asarray(rng_np.uniform(-1, 1, (B, N, 3)).astype(np.float32))
        c = jnp.asarray(rng_np.uniform(-1, 1, (B, M, 3)).astype(np.float32))
        f = jnp.asarray(rng_np.uniform(-1, 1, (B, N, C)).astype(np.float32))
        kw = dict(radius=0.3, nsample=K, use_xyz=True,
                  include_abs_coordinate=True, include_center_coordinate=True,
                  subset=False)
        ref, cnt_ref = grouping.query_and_group(x, c, f, **kw)

        monkeypatch.setattr(sampling, "_use_pallas", lambda: True)
        monkeypatch.setattr(
            grouping, "_use_fused_ball_gather", lambda *a: True
        )
        import point_diffusion_refinement_tpu.ops.pallas_neighbors as pn

        orig = pn.ball_query_group_pallas
        monkeypatch.setattr(
            pn, "ball_query_group_pallas",
            lambda *a, **k: orig(*a[:5], True),
        )
        out, cnt = grouping.query_and_group(x, c, f, **kw)
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_ref))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-4
        )

    def test_fused_gather_grad_matches_unfused(self, monkeypatch, rng_np):
        """d(loss)/d(features) through the fused custom VJP ~= the XLA
        gather's VJP (bf16-rounded cotangents)."""
        from point_diffusion_refinement_tpu.models import grouping
        from point_diffusion_refinement_tpu.ops import sampling

        B, N, M, K, C = 1, 100, 24, 8, 6
        x = jnp.asarray(rng_np.uniform(-1, 1, (B, N, 3)).astype(np.float32))
        c = jnp.asarray(rng_np.uniform(-1, 1, (B, M, 3)).astype(np.float32))
        f = jnp.asarray(rng_np.uniform(-1, 1, (B, N, C)).astype(np.float32))
        kw = dict(radius=0.4, nsample=K, use_xyz=True, subset=True)

        def loss_unfused(f_):
            out, _ = grouping.query_and_group(x, c, f_, **kw)
            return jnp.sum(out ** 2)

        g_ref = jax.grad(loss_unfused)(f)

        monkeypatch.setattr(sampling, "_use_pallas", lambda: True)
        monkeypatch.setattr(grouping, "_use_fused_ball_gather", lambda *a: True)
        import point_diffusion_refinement_tpu.ops.pallas_neighbors as pn

        orig = pn.ball_query_group_pallas
        monkeypatch.setattr(
            pn, "ball_query_group_pallas", lambda *a, **k: orig(*a[:5], True)
        )
        g_fused = jax.grad(loss_unfused)(f)
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_ref), rtol=2e-2, atol=2e-2
        )


class TestPallasFPSFolded:
    """Sublane-folded FPS ((B, N) -> (B*fold, N/fold)): bit-parity with the
    XLA reference at fold-eligible shapes, including ties and padding.
    Opt-in (PDR_FPS_FOLD; measured negative at the shipped shapes — see
    _fps_fold) so the flag is forced on here."""

    @pytest.fixture(autouse=True)
    def _enable_fold(self, monkeypatch):
        from point_diffusion_refinement_tpu.ops import pallas_fps

        monkeypatch.setattr(pallas_fps, "_FPS_FOLD_ENABLED", True)
        pallas_fps._fps_pallas_impl.clear_cache()
        yield
        pallas_fps._fps_pallas_impl.clear_cache()

    @pytest.mark.parametrize("B,N,npoint", [(4, 256, 32), (2, 512, 64), (1, 1024, 64)])
    def test_fold_parity(self, rng_np, B, N, npoint):
        from point_diffusion_refinement_tpu.ops.pallas_fps import _fps_fold

        assert _fps_fold(B, N) > 1
        x = jnp.asarray(rng_np.uniform(-1, 1, (B, N, 3)).astype(np.float32))
        a = np.asarray(furthest_point_sample_xla(x, npoint))
        b = np.asarray(furthest_point_sample_pallas(x, npoint, interpret=True))
        np.testing.assert_array_equal(a, b)

    def test_fold_padding_skip(self, rng_np):
        x = rng_np.uniform(0.5, 1.5, (4, 256, 3)).astype(np.float32)
        x[:, 200:] = 0.0
        idx = np.asarray(
            furthest_point_sample_pallas(jnp.asarray(x), 32, interpret=True)
        )
        assert (idx[:, 1:] < 200).all()

    def test_fold_cross_half_ties(self):
        # duplicate points mirrored across the fold boundary: the tie must
        # resolve to the LOWEST global index, exercising the cross-fold min
        rng = np.random.default_rng(11)
        half = rng.uniform(-1, 1, (2, 128, 3)).astype(np.float32)
        x = jnp.asarray(np.concatenate([half, half], axis=1))  # (2, 256, 3)
        a = np.asarray(furthest_point_sample_xla(x, 48))
        b = np.asarray(furthest_point_sample_pallas(x, 48, interpret=True))
        np.testing.assert_array_equal(a, b)
