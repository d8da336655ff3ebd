"""PVCNN2 backbone tests: voxelization round trips and the completion
forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_diffusion_refinement_tpu.models.pvcnn import (
    PVCNN2Base,
    PVCNN2Completion,
    PVConv,
    avg_voxelize,
    normalize_coords,
    trilinear_devoxelize,
)


class TestVoxelization:
    def test_avg_voxelize_matches_numpy(self, rng_np):
        B, N, C, r = 2, 50, 4, 4
        feats = rng_np.standard_normal((B, N, C)).astype(np.float32)
        coords = rng_np.integers(0, r, (B, N, 3)).astype(np.int32)
        out = np.asarray(avg_voxelize(jnp.asarray(feats), jnp.asarray(coords), r))
        want = np.zeros((B, r, r, r, C))
        cnt = np.zeros((B, r, r, r))
        for b in range(B):
            for n in range(N):
                x, y, z = coords[b, n]
                want[b, x, y, z] += feats[b, n]
                cnt[b, x, y, z] += 1
        want = want / np.maximum(cnt, 1)[..., None]
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)

    def test_trilinear_at_cell_centers_is_exact(self, rng_np):
        B, r, C = 1, 4, 3
        vox = rng_np.standard_normal((B, r, r, r, C)).astype(np.float32)
        # integer coords -> exact gather
        coords = np.stack(np.meshgrid(*[np.arange(r)] * 3, indexing="ij"), -1)
        coords = coords.reshape(1, -1, 3).astype(np.float32)
        out = np.asarray(trilinear_devoxelize(jnp.asarray(vox), jnp.asarray(coords), r))
        np.testing.assert_allclose(out[0], vox[0].reshape(-1, C), rtol=1e-5)

    def test_trilinear_interpolates_midpoint(self):
        r = 2
        vox = np.zeros((1, r, r, r, 1), np.float32)
        vox[0, 0, 0, 0, 0] = 0.0
        vox[0, 1, 0, 0, 0] = 2.0
        coords = np.asarray([[[0.5, 0.0, 0.0]]], np.float32)
        out = float(trilinear_devoxelize(jnp.asarray(vox), jnp.asarray(coords), r)[0, 0, 0])
        assert out == pytest.approx(1.0)

    def test_normalize_coords_in_range(self, rng_np):
        coords = jnp.asarray(rng_np.uniform(-3, 3, (2, 40, 3)).astype(np.float32))
        nc = np.asarray(normalize_coords(coords, 8))
        assert nc.min() >= 0 and nc.max() <= 7


class TestPVConv:
    def test_forward_shape(self, rng_np):
        m = PVConv(out_channels=16, resolution=4, attention=True, dropout=None)
        feats = jnp.asarray(rng_np.standard_normal((2, 32, 8)).astype(np.float32))
        coords = jnp.asarray(rng_np.uniform(-1, 1, (2, 32, 3)).astype(np.float32))
        params = m.init(jax.random.key(0), feats, coords)
        out = m.apply(params, feats, coords)
        assert out.shape == (2, 32, 16)


class TestPVCNN2:
    def test_completion_forward(self, rng_np):
        # miniature block config for CPU testability
        model = PVCNN2Completion(
            num_classes=3, sv_points=32, embed_dim=16, use_att=True, dropout=None,
            extra_feature_channels=0,
            sa_blocks=(
                ((8, 1, 4), (16, 0.2, 8, (8, 16))),
                (None, (8, 0.4, 8, (16, 16))),
            ),
            fp_blocks=(
                ((16, 16), (8, 1, 4)),
                ((16, 8), (8, 1, 4)),
            ),
        )
        x = jnp.asarray(rng_np.uniform(-0.5, 0.5, (2, 24, 3)).astype(np.float32))
        cond = jnp.asarray(rng_np.uniform(-0.5, 0.5, (2, 16, 3)).astype(np.float32))
        ts = jnp.asarray([0.0, 500.0])
        params = model.init(jax.random.key(0), x, cond, ts)
        out = model.apply(params, x, cond, ts)
        assert out.shape == (2, 24, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_grad_flow(self, rng_np):
        model = PVCNN2Completion(
            num_classes=3, sv_points=16, embed_dim=8, use_att=False, dropout=None,
            extra_feature_channels=0,
            sa_blocks=(((8, 1, 4), (8, 0.3, 4, (8, 8))),),
            fp_blocks=(((8, 8), None),),
        )
        x = jnp.asarray(rng_np.uniform(-0.5, 0.5, (1, 16, 3)).astype(np.float32))
        cond = jnp.asarray(rng_np.uniform(-0.5, 0.5, (1, 8, 3)).astype(np.float32))
        ts = jnp.zeros((1,))
        params = model.init(jax.random.key(0), x, cond, ts)
        g = jax.grad(lambda p: jnp.mean(model.apply(p, x, cond, ts) ** 2))(params)
        assert all(
            np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g)
        )
