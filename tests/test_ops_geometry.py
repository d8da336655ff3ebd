"""Parity tests of the XLA geometry ops against straightforward numpy
references — the TPU analogue of the reference's CUDA-vs-python unit_test.py
pattern (ChamferDistancePytorch/unit_test.py:14-36)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_diffusion_refinement_tpu import ops


def np_fps(xyz, npoint):
    """Literal port of sampling_gpu.cu:69-173 semantics."""
    B, N, _ = xyz.shape
    idxs = np.zeros((B, npoint), dtype=np.int32)
    for b in range(B):
        pts = xyz[b]
        valid = (pts ** 2).sum(-1) > 1e-3
        mind = np.full(N, 1e10)
        old = 0
        for j in range(1, npoint):
            d = ((pts - pts[old]) ** 2).sum(-1)
            mind = np.minimum(mind, d)
            cand = np.where(valid, mind, -1.0)
            old = int(np.argmax(cand))
            idxs[b, j] = old
    return idxs


class TestFPS:
    def test_matches_numpy(self, rng_np):
        xyz = rng_np.standard_normal((3, 128, 3)).astype(np.float32)
        got = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 32))
        want = np_fps(xyz, 32)
        np.testing.assert_array_equal(got, want)

    def test_skips_padding_points(self, rng_np):
        xyz = rng_np.standard_normal((2, 64, 3)).astype(np.float32) + 2.0
        xyz[:, 40:] = 0.0  # padding: zero points must never be selected
        idx = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 16))
        assert (idx[:, 1:] < 40).all()

    def test_prefix_stability(self, rng_np):
        """Greedy FPS is prefix-stable: running FPS on an FPS-ordered subset
        selects the identity prefix.  This is what lets SetAbstraction skip
        FPS entirely for levels > 0 (models/modules.py fps_ordered=True)."""
        xyz = rng_np.standard_normal((3, 256, 3)).astype(np.float32)
        idx1 = ops.furthest_point_sample(jnp.asarray(xyz), 128)
        s = ops.gather_points(jnp.asarray(xyz), idx1)
        idx2 = np.asarray(ops.furthest_point_sample(s, 32))
        np.testing.assert_array_equal(idx2, np.tile(np.arange(32), (3, 1)))
        # with duplicated points (argmax ties)
        xd = jnp.concatenate([jnp.asarray(xyz[:, :128])] * 2, axis=1)
        sd = ops.gather_points(xd, ops.furthest_point_sample(xd, 64))
        idx3 = np.asarray(ops.furthest_point_sample(sd, 16))
        np.testing.assert_array_equal(idx3, np.tile(np.arange(16), (3, 1)))

    def test_spread(self, rng_np):
        # FPS should be more spread than the prefix: min pairwise distance of
        # the FPS subset must beat that of the first-npoint subset
        xyz = rng_np.uniform(-1, 1, (1, 512, 3)).astype(np.float32)
        idx = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 64))[0]
        sub = xyz[0, idx]
        d = ((sub[:, None] - sub[None]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        pre = xyz[0, :64]
        dp = ((pre[:, None] - pre[None]) ** 2).sum(-1)
        np.fill_diagonal(dp, np.inf)
        assert d.min() > dp.min()


class TestBallQuery:
    def np_ball_query(self, xyz, centers, radius, K):
        """Literal port of ball_query_gpu.cu:9-47."""
        B, M, _ = centers.shape
        idx = np.zeros((B, M, K), dtype=np.int32)
        cnt = np.zeros((B, M), dtype=np.int32)
        for b in range(B):
            for j in range(M):
                c = 0
                for k in range(xyz.shape[1]):
                    d2 = ((centers[b, j] - xyz[b, k]) ** 2).sum()
                    if d2 < radius ** 2:
                        if c == 0:
                            idx[b, j, :] = k
                        idx[b, j, c] = k
                        c += 1
                        if c >= K:
                            break
                cnt[b, j] = c
        return idx, cnt

    def test_matches_numpy(self, rng_np):
        xyz = rng_np.uniform(-1, 1, (2, 200, 3)).astype(np.float32)
        centers = xyz[:, :50]
        idx, cnt = ops.ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.3, 16)
        widx, wcnt = self.np_ball_query(xyz, centers, 0.3, 16)
        np.testing.assert_array_equal(np.asarray(cnt), wcnt)
        np.testing.assert_array_equal(np.asarray(idx), widx)

    def test_empty_ball(self):
        xyz = jnp.ones((1, 8, 3))
        centers = -jnp.ones((1, 2, 3)) * 10
        idx, cnt = ops.ball_query(xyz, centers, 0.1, 4)
        assert np.asarray(cnt).sum() == 0
        np.testing.assert_array_equal(np.asarray(idx), 0)


class TestKnn:
    def test_matches_numpy(self, rng_np):
        q = rng_np.standard_normal((2, 33, 3)).astype(np.float32)
        p = rng_np.standard_normal((2, 77, 3)).astype(np.float32)
        d, idx = ops.knn(jnp.asarray(q), jnp.asarray(p), 5)
        full = ((q[:, :, None] - p[:, None]) ** 2).sum(-1)
        want_idx = np.argsort(full, axis=-1, kind="stable")[..., :5]
        np.testing.assert_array_equal(np.asarray(idx), want_idx)
        np.testing.assert_allclose(
            np.asarray(d), np.take_along_axis(full, want_idx, -1), rtol=1e-4, atol=1e-5
        )


class TestInterpolate:
    def test_three_interpolate(self, rng_np):
        unknown = rng_np.standard_normal((2, 20, 3)).astype(np.float32)
        known = rng_np.standard_normal((2, 9, 3)).astype(np.float32)
        feats = rng_np.standard_normal((2, 9, 7)).astype(np.float32)
        dist, idx = ops.three_nn(jnp.asarray(unknown), jnp.asarray(known))
        w = ops.inverse_distance_weights(dist)
        out = ops.three_interpolate(jnp.asarray(feats), idx, w)
        # numpy reference
        full = np.sqrt(((unknown[:, :, None] - known[:, None]) ** 2).sum(-1))
        widx = np.argsort(full, axis=-1, kind="stable")[..., :3]
        wd = np.take_along_axis(full, widx, -1)
        recip = 1.0 / (wd + 1e-8)
        ww = recip / recip.sum(-1, keepdims=True)
        want = np.einsum("bnk,bnkc->bnc", ww, feats[np.arange(2)[:, None, None], widx])
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)

    def test_exact_at_known_points(self, rng_np):
        known = rng_np.standard_normal((1, 16, 3)).astype(np.float32)
        feats = rng_np.standard_normal((1, 16, 4)).astype(np.float32)
        dist, idx = ops.three_nn(jnp.asarray(known), jnp.asarray(known))
        w = ops.inverse_distance_weights(dist)
        out = ops.three_interpolate(jnp.asarray(feats), idx, w)
        np.testing.assert_allclose(np.asarray(out), feats, rtol=1e-4, atol=1e-4)


class TestGather:
    def test_group_points(self, rng_np):
        pts = rng_np.standard_normal((2, 10, 4)).astype(np.float32)
        idx = rng_np.integers(0, 10, (2, 5, 3)).astype(np.int32)
        out = np.asarray(ops.group_points(jnp.asarray(pts), jnp.asarray(idx)))
        for b in range(2):
            np.testing.assert_array_equal(out[b], pts[b][idx[b]])

    def test_gather_grad_is_scatter_add(self):
        pts = jnp.arange(12.0).reshape(1, 4, 3)
        idx = jnp.asarray([[0, 0, 2]], dtype=jnp.int32)
        g = jax.grad(lambda p: ops.gather_points(p, idx).sum())(pts)
        want = np.zeros((1, 4, 3))
        want[0, 0] = 2.0
        want[0, 2] = 1.0
        np.testing.assert_array_equal(np.asarray(g), want)


class TestChamfer:
    def test_calc_cd_against_numpy(self, rng_np):
        x = rng_np.standard_normal((3, 50, 3)).astype(np.float32)
        y = rng_np.standard_normal((3, 40, 3)).astype(np.float32)
        cd_p, cd_t, f1 = ops.calc_cd(jnp.asarray(y), jnp.asarray(x), True)
        d1 = ((x[:, :, None] - y[:, None]) ** 2).sum(-1).min(-1)  # gt=x -> out=y
        d2 = ((y[:, :, None] - x[:, None]) ** 2).sum(-1).min(-1)
        want_p = (np.sqrt(d1).mean(1) + np.sqrt(d2).mean(1)) / 2
        want_t = d1.mean(1) + d2.mean(1)
        np.testing.assert_allclose(np.asarray(cd_p), want_p, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cd_t), want_t, rtol=1e-4, atol=1e-6)
        p1 = (d1 < 1e-4).mean(1)
        p2 = (d2 < 1e-4).mean(1)
        want_f = np.where(p1 + p2 > 0, 2 * p1 * p2 / np.maximum(p1 + p2, 1e-12), 0)
        np.testing.assert_allclose(np.asarray(f1), want_f, rtol=1e-5, atol=1e-7)

    def test_identical_clouds_zero(self, rng_np):
        x = jnp.asarray(rng_np.standard_normal((2, 30, 3)).astype(np.float32))
        cd_p, cd_t = ops.calc_cd(x, x)
        np.testing.assert_allclose(np.asarray(cd_t), 0, atol=1e-10)

    def test_chunked_path_matches_direct(self, rng_np):
        import point_diffusion_refinement_tpu.ops.chamfer as ch

        x = jnp.asarray(rng_np.standard_normal((2, 300, 3)).astype(np.float32))
        y = jnp.asarray(rng_np.standard_normal((2, 257, 3)).astype(np.float32))
        d_direct, i_direct = ch.nn_sqdist(x, y)
        old = ch._TILE_BUDGET
        try:
            ch._TILE_BUDGET = 1024  # force chunking
            d_chunk, i_chunk = ch.nn_sqdist(x, y)
        finally:
            ch._TILE_BUDGET = old
        np.testing.assert_allclose(
            np.asarray(d_direct), np.asarray(d_chunk), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(i_direct), np.asarray(i_chunk))

    def test_grad_flows_to_both(self, rng_np):
        x = jnp.asarray(rng_np.standard_normal((1, 16, 3)).astype(np.float32))
        y = jnp.asarray(rng_np.standard_normal((1, 16, 3)).astype(np.float32))
        g = jax.grad(lambda a, b: ops.calc_cd(a, b)[1].sum(), argnums=(0, 1))(x, y)
        assert np.abs(np.asarray(g[0])).sum() > 0
        assert np.abs(np.asarray(g[1])).sum() > 0


class TestEMD:
    def test_identical_clouds_near_zero(self, rng_np):
        x = jnp.asarray(rng_np.standard_normal((2, 64, 3)).astype(np.float32))
        cost = np.asarray(ops.earth_mover_distance(x, x))
        assert (cost < 1e-3).all()

    def test_permutation_invariance(self, rng_np):
        # pointnet2/emd.py:74-112 smoke-test property
        x = jnp.asarray(rng_np.standard_normal((1, 64, 3)).astype(np.float32))
        y = jnp.asarray(rng_np.standard_normal((1, 64, 3)).astype(np.float32))
        perm = rng_np.permutation(64)
        c1 = np.asarray(ops.earth_mover_distance(x, y))
        c2 = np.asarray(ops.earth_mover_distance(x[:, perm], y))
        np.testing.assert_allclose(c1, c2, rtol=1e-3, atol=1e-4)

    def test_two_point_closed_form(self):
        # PytorchEMD/test_emd_loss.py analogue: 2 points, known matching
        x = jnp.asarray([[[0.0, 0, 0], [1, 0, 0]]])
        y = jnp.asarray([[[0.0, 0.1, 0], [1, -0.1, 0]]])
        cost = float(ops.earth_mover_distance(x, y)[0])
        want = (0.1 ** 2 + 0.1 ** 2) / 2  # match each to its near partner
        np.testing.assert_allclose(cost, want, rtol=0.05)

    def test_match_is_doubly_stochastic(self, rng_np):
        x = jnp.asarray(rng_np.standard_normal((1, 32, 3)).astype(np.float32))
        y = jnp.asarray(rng_np.standard_normal((1, 32, 3)).astype(np.float32))
        match = np.asarray(ops.approx_match(x, y))[0]  # (m, n)
        np.testing.assert_allclose(match.sum(0), 1.0, atol=0.05)
        np.testing.assert_allclose(match.sum(1), 1.0, atol=0.05)

    def test_gradient_direction(self):
        # moving y toward x must decrease EMD; grad of cost wrt y points away
        x = jnp.zeros((1, 8, 3))
        y = jnp.ones((1, 8, 3))
        g = jax.grad(lambda yy: ops.earth_mover_distance(x, yy).sum())(y)
        assert np.asarray(g).mean() > 0  # increasing y increases cost

    def test_gradient_matches_match_based_formula(self, rng_np):
        """The VJP accumulates from stored per-round ratios; it must equal the
        reference's match-based analytic gradient (emd_kernel.cu
        matchcostgrad1/2: 2 * match[l,k] * (x1_k - x2_l) / max(n, m))
        computed from the explicit match matrix.  n != m exercises the
        integer mass-initialization path."""
        x = jnp.asarray(rng_np.standard_normal((2, 24, 3)).astype(np.float32))
        y = jnp.asarray(rng_np.standard_normal((2, 12, 3)).astype(np.float32))
        g1, g2 = jax.grad(
            lambda a, b: ops.earth_mover_distance(a, b).sum(), argnums=(0, 1)
        )(x, y)
        match = np.asarray(ops.approx_match(x, y))  # (B, m, n)
        match = np.swapaxes(match, 1, 2)  # (B, n, m)
        xn, yn = np.asarray(x), np.asarray(y)
        scale = 1.0 / max(24, 12)
        want1 = 2.0 * scale * (
            xn * match.sum(2)[..., None] - np.einsum("bnm,bmc->bnc", match, yn)
        )
        want2 = 2.0 * scale * (
            yn * match.sum(1)[..., None] - np.einsum("bnm,bnc->bmc", match, xn)
        )
        np.testing.assert_allclose(np.asarray(g1), want1, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g2), want2, rtol=1e-4, atol=1e-5)


class TestMaskedMean:
    def test_counts(self):
        feat = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 2, 4, 3))
        counts = jnp.asarray([[2, 4]])
        out = np.asarray(ops.masked_mean(feat, counts))
        want0 = feat[0, 0, :2].mean(0)
        want1 = feat[0, 1, :4].mean(0)
        np.testing.assert_allclose(out[0, 0], want0, rtol=1e-6)
        np.testing.assert_allclose(out[0, 1], want1, rtol=1e-6)

    def test_all(self):
        feat = jnp.ones((2, 3, 5, 4))
        out = ops.masked_mean(feat, "all")
        assert out.shape == (2, 3, 4)


class TestBallQueryLargeK:
    def test_nsample_exceeds_point_count(self, rng_np):
        """The coarsest FT level queries a 16-point cloud with nsample=32
        (decoder radius ladder, config feature_mapper_architecture)."""
        xyz = jnp.asarray(rng_np.uniform(-1, 1, (2, 16, 3)).astype(np.float32))
        centers = jnp.asarray(rng_np.uniform(-1, 1, (2, 5, 3)).astype(np.float32))
        idx, cnt = ops.ball_query(xyz, centers, 4.0, 32)
        assert idx.shape == (2, 5, 32)
        assert (np.asarray(cnt) <= 16).all()
        # all points are within radius 4.0 of everything: counts = 16
        np.testing.assert_array_equal(np.asarray(cnt), 16)
        # slots beyond the count repeat the first neighbor
        first = np.asarray(idx)[..., :1]
        np.testing.assert_array_equal(np.asarray(idx)[..., 16:], np.repeat(first, 16, -1))
