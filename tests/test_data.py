"""Data layer tests: augmentation invertibility, mirror preprocessing, and
the MVP h5 loading path against synthetic reference-layout files."""

import numpy as np
import pytest

from point_diffusion_refinement_tpu.data import (
    MVPDataset,
    MVPDatasetConfig,
    VIEWS_PER_SHAPE,
    augment_cloud,
    iterate_batches,
    mirror_and_concat,
    write_mvp_style_h5,
)


class TestAugment:
    def test_shared_transform_across_clouds(self, rng_np):
        args = {
            "pc_augm_scale": 1.2,
            "pc_augm_rot": True,
            "pc_rot_scale": 90,
            "pc_augm_mirror_prob": 0.5,
            "pc_augm_jitter": False,
            "translation_magnitude": 0.1,
        }
        a = rng_np.uniform(-0.5, 0.5, (64, 3)).astype(np.float32)
        b = a.copy()
        (a2, b2), params = augment_cloud(
            [a, b], args, return_augmentation_params=True,
            rng=np.random.default_rng(0),
        )
        np.testing.assert_allclose(a2, b2)  # same M and translation for both
        # un-augment recovers the original
        rec = (a2 - params["translation"]) @ params["M_inv"]
        np.testing.assert_allclose(rec, a, atol=1e-5)

    def test_mirror_flag_channel_untouched(self, rng_np):
        args = {"pc_augm_scale": 1.2, "pc_augm_rot": True, "pc_rot_scale": 90,
                "pc_augm_mirror_prob": 0.5, "pc_augm_jitter": False}
        cloud = np.concatenate(
            [rng_np.uniform(-0.5, 0.5, (32, 3)), np.sign(rng_np.standard_normal((32, 1)))],
            axis=1,
        ).astype(np.float32)
        (out,) = augment_cloud([cloud], args, rng=np.random.default_rng(1))
        np.testing.assert_array_equal(out[:, 3], cloud[:, 3])

    def test_rotation_is_about_y(self):
        args = {"pc_augm_scale": 0, "pc_augm_rot": True, "pc_rot_scale": 180,
                "pc_augm_mirror_prob": 0, "pc_augm_jitter": False}
        cloud = np.array([[0.3, 0.7, -0.1]], dtype=np.float32)
        (out,) = augment_cloud([cloud], args, rng=np.random.default_rng(2))
        assert out[0, 1] == pytest.approx(0.7, abs=1e-6)  # y preserved


class TestMirror:
    def test_mirror_and_concat(self, rng_np):
        import jax.numpy as jnp

        partial = jnp.asarray(
            rng_np.uniform(-0.5, 0.5, (2, 64, 3)).astype(np.float32)
        )
        out = np.asarray(mirror_and_concat(partial, 48))
        assert out.shape == (2, 48, 4)
        assert set(np.unique(out[..., 3])) <= {-1.0, 1.0}
        # mirrored points must be reflections: for flag=-1 points, their
        # (x, y, -z) must appear in the original cloud
        orig = np.asarray(partial[0])
        for p in out[0]:
            q = p[:3].copy()
            if p[3] < 0:
                q[2] = -q[2]
            d = np.abs(orig - q).sum(axis=1).min()
            assert d < 1e-5


@pytest.fixture(scope="module")
def mvp_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mvp_data")
    return write_mvp_style_h5(str(d), num_shapes=4, npoints=128, partial_points=96)


class TestMVPDataset:
    def test_basic_pairing(self, mvp_dir):
        ds = MVPDataset(MVPDatasetConfig(data_dir=mvp_dir, train=True, npoints=128))
        assert len(ds) == 6 * VIEWS_PER_SHAPE  # 4 + 2 novel shapes
        item = ds[27]
        assert item["partial"].shape == (96, 3)
        assert item["complete"].shape == (128, 3)
        # item 27 belongs to gt shape 1
        np.testing.assert_allclose(item["complete"], ds.gt_data[1])

    def test_scale(self, mvp_dir):
        ds1 = MVPDataset(MVPDatasetConfig(data_dir=mvp_dir, train=False, npoints=128, scale=1))
        ds2 = MVPDataset(MVPDatasetConfig(data_dir=mvp_dir, train=False, npoints=128, scale=2))
        np.testing.assert_allclose(ds2.gt_data, ds1.gt_data * 2, rtol=1e-6)
        # scale=1 doubles the raw [-0.5, 0.5] data to [-1, 1]
        assert np.abs(ds1.gt_data).max() <= 1.0 + 1e-5

    def test_rank_sharding_partition(self, mvp_dir):
        full = MVPDataset(MVPDatasetConfig(data_dir=mvp_dir, train=True, npoints=128))
        shards = [
            MVPDataset(
                MVPDatasetConfig(
                    data_dir=mvp_dir, train=True, npoints=128,
                    rank=r, world_size=2, append_samples_to_last_rank=False,
                )
            )
            for r in range(2)
        ]
        total = sum(len(s) for s in shards)
        assert total == len(full)
        np.testing.assert_allclose(
            np.concatenate([shards[0].input_data, shards[1].input_data]),
            full.input_data,
        )

    def test_last_rank_padding(self, mvp_dir):
        # 6 gt shapes over 4 ranks -> ceil(6/4)=2 shapes/rank, last rank padded
        last = MVPDataset(
            MVPDatasetConfig(
                data_dir=mvp_dir, train=True, npoints=128,
                rank=3, world_size=4, append_samples_to_last_rank=True,
            )
        )
        assert len(last) == 2 * VIEWS_PER_SHAPE

    def test_random_subsample(self, mvp_dir):
        ds = MVPDataset(
            MVPDatasetConfig(
                data_dir=mvp_dir, train=False, npoints=128,
                random_subsample=True, num_samples=10,
            )
        )
        assert len(ds) == 10
        it = ds[3]  # pairing must still be consistent via partial_to_gt
        assert it["complete"].shape == (128, 3)

    def test_augmented_batches(self, mvp_dir):
        aug = {"pc_augm_scale": 1.2, "pc_augm_rot": True, "pc_rot_scale": 90,
               "pc_augm_mirror_prob": 0.5, "pc_augm_jitter": False,
               "translation_magnitude": 0.1}
        ds = MVPDataset(
            MVPDatasetConfig(
                data_dir=mvp_dir, train=True, npoints=128, augmentation=aug,
                return_augmentation_params=True,
            )
        )
        batch = next(iterate_batches(ds, 8, seed=0))
        assert batch["partial"].shape == (8, 96, 3)
        assert batch["complete"].shape == (8, 128, 3)
        assert batch["M_inv"].shape == (8, 3, 3)
        assert batch["translation"].shape == (8, 1, 3)
        assert batch["label"].shape == (8,)


class TestNativeBatchPath:
    def test_native_kernels_match_numpy(self, rng_np):
        from point_diffusion_refinement_tpu.data.native import (
            apply_similarity,
            gather_rows,
            native_available,
        )

        clouds = rng_np.standard_normal((3, 20, 4)).astype(np.float32)
        M = rng_np.standard_normal((3, 3, 3)).astype(np.float32)
        t = rng_np.standard_normal((3, 3)).astype(np.float32)
        out = apply_similarity(clouds, M, t)
        want = clouds.copy()
        want[..., :3] = np.einsum("bnc,bdc->bnd", clouds[..., :3], M) + t[:, None, :]
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(out[..., 3], clouds[..., 3])

        src = rng_np.standard_normal((10, 5, 2)).astype(np.float32)
        idx = np.array([3, 0, 7, 7], np.int64)
        np.testing.assert_array_equal(gather_rows(src, idx), src[idx])
        print("native lib available:", native_available())

    def test_batched_collation_matches_itemwise(self, mvp_dir):
        from point_diffusion_refinement_tpu.data.mvp import get_batch_fast

        ds = MVPDataset(MVPDatasetConfig(data_dir=mvp_dir, train=True, npoints=128))
        idx = np.array([0, 27, 53])
        fast = get_batch_fast(ds, idx)
        slow = {
            k: np.stack([ds[int(j)][k] for j in idx])
            for k in ("partial", "complete", "label")
        }
        np.testing.assert_allclose(fast["partial"], slow["partial"], rtol=1e-6)
        np.testing.assert_allclose(fast["complete"], slow["complete"], rtol=1e-6)
        np.testing.assert_array_equal(fast["label"], slow["label"])

    def test_batched_augmentation_shares_transform(self, mvp_dir):
        aug = {"pc_augm_scale": 1.2, "pc_augm_rot": True, "pc_rot_scale": 90,
               "pc_augm_mirror_prob": 0.5, "pc_augm_jitter": False,
               "translation_magnitude": 0.1}
        ds = MVPDataset(
            MVPDatasetConfig(data_dir=mvp_dir, train=True, npoints=128,
                             augmentation=aug, return_augmentation_params=True)
        )
        from point_diffusion_refinement_tpu.data.mvp import get_batch_fast

        idx = np.array([0, 30])
        b = get_batch_fast(ds, idx)
        # un-augmenting must recover the raw clouds
        rec = np.einsum("bnc,bcd->bnd", b["complete"] - b["translation"], b["M_inv"])
        np.testing.assert_allclose(rec, ds.gt_data[ds.partial_to_gt[idx]],
                                   rtol=1e-4, atol=1e-5)
        rec_p = np.einsum("bnc,bcd->bnd",
                          b["partial"][..., :3] - b["translation"], b["M_inv"])
        np.testing.assert_allclose(rec_p, ds.input_data[idx][..., :3],
                                   rtol=1e-4, atol=1e-5)


class TestExperimentConfigs:
    def test_all_shipped_configs_roundtrip_and_build(self, tmp_path):
        from point_diffusion_refinement_tpu.config import load_config, write_all
        from point_diffusion_refinement_tpu.train.loop import build_model

        paths = write_all(str(tmp_path))
        from point_diffusion_refinement_tpu.config.exp_configs import EXPERIMENTS

        assert len(paths) == len(EXPERIMENTS) >= 7
        for p in paths:
            cfg = load_config(p)
            build_model(cfg["pointnet_config"])
        # upsample config carries the right head factor
        up = load_config(str(tmp_path / "config_upsample_16384.json"))
        assert up["pointnet_config"]["point_upsample_factor"] == 8
        assert up["refine_config"]["cd_loss_thred"] == 0.0003
