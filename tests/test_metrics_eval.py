"""Tests for generation-quality metrics, checkpointing, and the evaluation
loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_diffusion_refinement_tpu.metrics import (
    compute_all_metrics,
    jensen_shannon_divergence,
    jsd_between_point_cloud_sets,
    lgan_mmd_cov,
    one_nn_accuracy,
    pairwise_emd_cd,
)


class TestMMDCov:
    def test_identical_sets(self, rng_np):
        pcs = rng_np.uniform(-0.4, 0.4, (6, 64, 3)).astype(np.float32)
        cd, emd = pairwise_emd_cd(pcs, pcs, batch_size=4)
        # diagonal must be (near) zero and the argmin
        assert np.allclose(np.diag(cd), 0, atol=1e-5)
        res = lgan_mmd_cov(cd)
        assert res["lgan_mmd"] < 1e-5
        assert res["lgan_cov"] == 1.0

    def test_one_nn_accuracy_identical_distribution(self, rng_np):
        # same generative process -> 1-NNA should hover around 0.5
        a = rng_np.uniform(-0.4, 0.4, (10, 32, 3)).astype(np.float32)
        b = rng_np.uniform(-0.4, 0.4, (10, 32, 3)).astype(np.float32)
        cd_ab, _ = pairwise_emd_cd(a, b, 8)
        cd_aa, _ = pairwise_emd_cd(a, a, 8)
        cd_bb, _ = pairwise_emd_cd(b, b, 8)
        res = one_nn_accuracy(cd_aa, cd_ab, cd_bb, 1)
        assert 0.2 <= res["acc"] <= 0.8

    def test_compute_all_metrics_keys(self, rng_np):
        a = rng_np.uniform(-0.4, 0.4, (4, 32, 3)).astype(np.float32)
        b = rng_np.uniform(-0.4, 0.4, (4, 32, 3)).astype(np.float32)
        res = compute_all_metrics(a, b, batch_size=4)
        for key in ("lgan_mmd-CD", "lgan_cov-CD", "lgan_mmd-EMD", "1-NN-CD-acc",
                    "1-NN-EMD-acc"):
            assert key in res, key


class TestJSD:
    def test_jsd_zero_for_identical(self, rng_np):
        pcs = rng_np.uniform(-0.3, 0.3, (5, 128, 3)).astype(np.float32)
        assert jsd_between_point_cloud_sets(pcs, pcs, resolution=12) < 1e-9

    def test_jsd_positive_for_different(self, rng_np):
        a = rng_np.uniform(-0.45, -0.05, (5, 128, 3)).astype(np.float32)
        b = rng_np.uniform(0.05, 0.45, (5, 128, 3)).astype(np.float32)
        assert jsd_between_point_cloud_sets(a, b, resolution=12) > 0.5

    def test_jsd_symmetric_and_bounded(self):
        P = np.array([1.0, 2, 3, 0])
        Q = np.array([0.0, 1, 1, 2])
        j1 = jensen_shannon_divergence(P, Q)
        j2 = jensen_shannon_divergence(Q, P)
        assert j1 == pytest.approx(j2)
        assert 0 <= j1 <= 1.0


class TestCheckpoints:
    def test_save_resume_roundtrip(self, tmp_path):
        from point_diffusion_refinement_tpu.train import (
            find_max_epoch,
            maybe_resume,
            save_checkpoint,
        )

        state = {"w": np.arange(6, dtype=np.float32).reshape(2, 3), "step": np.int32(7)}
        save_checkpoint(str(tmp_path), 100, state, training_time_seconds=12.5)
        save_checkpoint(str(tmp_path), 250, state)
        assert find_max_epoch(str(tmp_path)) == 250
        assert find_max_epoch(str(tmp_path), "all") == [250, 100]
        restored, it, secs = maybe_resume(str(tmp_path), "max", state)
        assert it == 250
        np.testing.assert_array_equal(restored["w"], state["w"])
        restored, it, secs = maybe_resume(str(tmp_path), 100, state)
        assert it == 100 and secs == 12.5

    def test_fresh_init_when_empty(self, tmp_path):
        from point_diffusion_refinement_tpu.train import maybe_resume

        state, it, secs = maybe_resume(str(tmp_path), "max", {"w": np.zeros(2)})
        assert state is None and it == -1

    def test_best_mode(self, tmp_path):
        import pickle

        from point_diffusion_refinement_tpu.train import find_max_epoch, save_checkpoint

        state = {"w": np.zeros(2, np.float32)}
        for it in (10, 20, 30):
            save_checkpoint(str(tmp_path), it, state)
        eval_file = tmp_path / "eval.pkl"
        with open(eval_file, "wb") as f:
            pickle.dump({"iter": [10, 20, 30], "avg_cd": [0.5, 0.1, 0.3]}, f)
        assert find_max_epoch(str(tmp_path), "best", str(eval_file)) == 20


class TestEvaluateLoop:
    def test_identity_refiner_metrics(self, rng_np, tmp_path):
        """A generator that returns the GT must give ~zero CD/EMD and F1=1."""
        from point_diffusion_refinement_tpu.sample import evaluate

        def gen_fn(batch):
            return jnp.asarray(batch["complete"])

        batches = [
            {
                "complete": rng_np.uniform(-0.5, 0.5, (4, 64, 3)).astype(np.float32),
                "partial": rng_np.uniform(-0.5, 0.5, (4, 48, 3)).astype(np.float32),
                "label": np.arange(4),
            }
            for _ in range(2)
        ]
        res = evaluate(
            gen_fn, batches, scale=1.0, save_generated_samples=True,
            save_dir=str(tmp_path), keep_generated=True, print_every=100,
        )
        assert res.avg_cd < 1e-10
        assert (res.metrics["f1"] > 0.99).all()
        assert res.avg_emd < 1e-3
        assert res.generated.shape == (8, 64, 3)
        assert res.labels.shape == (8,)
        import h5py

        with h5py.File(tmp_path / "mvp_generated_data_64pts.h5", "r") as f:
            assert f["data"].shape == (8, 64, 3)

    def test_unaugment_path(self, rng_np):
        from point_diffusion_refinement_tpu.sample import evaluate

        gt = rng_np.uniform(-0.5, 0.5, (2, 32, 3)).astype(np.float32)
        M = np.eye(3, dtype=np.float32) * 1.3
        aug = gt @ M.T
        batches = [
            {
                "complete": aug,
                "partial": aug[:, :16],
                "label": np.zeros(2),
                "M_inv": np.broadcast_to(np.linalg.inv(M.T), (2, 3, 3)).astype(np.float32),
                "translation": np.zeros((2, 1, 3), np.float32),
            }
        ]
        res = evaluate(
            lambda b: jnp.asarray(b["complete"]), batches,
            unaugment_results=True, compute_emd=False, print_every=100,
        )
        assert res.avg_cd < 1e-10


class TestGenerationPipeline:
    def test_run_generation_with_overrides(self, tmp_path, rng_np):
        """run_generation end-to-end: trained-state override + synthetic
        dataset, FastDPM, h5 output in the reference taxonomy."""
        import glob
        import os

        import jax
        import jax.numpy as jnp

        from point_diffusion_refinement_tpu.config import tiny_pointnet_config
        from point_diffusion_refinement_tpu.data import (
            MVPDataset,
            MVPDatasetConfig,
            write_mvp_style_h5,
        )
        from point_diffusion_refinement_tpu.models import PointNet2CloudCondition
        from point_diffusion_refinement_tpu.sample.pipeline import run_generation
        from point_diffusion_refinement_tpu.train import create_train_state

        data_dir = write_mvp_style_h5(
            str(tmp_path / "mvp"), num_shapes=2, npoints=48, partial_points=32
        )
        config = {
            "diffusion_config": {"T": 8, "beta_0": 1e-4, "beta_T": 0.02},
            "pointnet_config": {**tiny_pointnet_config(), "model_name": "pipe"},
            "train_config": {"task": "completion", "root_directory": str(tmp_path)},
            "mvp_dataset_config": {
                "data_dir": data_dir, "npoints": 48, "scale": 1,
                "eval_batch_size": 16,
            },
        }
        model = PointNet2CloudCondition.from_config(config["pointnet_config"])
        ds = MVPDataset(MVPDatasetConfig(data_dir=data_dir, train=False, npoints=48))
        x = jnp.zeros((1, 48, 3))
        cond = jnp.zeros((1, 32, 3))
        params = model.init(
            jax.random.key(0), x, cond, jnp.zeros((1,)), jnp.zeros((1,), jnp.int32)
        )
        state, _ = create_train_state(params, jax.random.key(1))
        results = run_generation(
            config,
            phase="test",
            fast_sampling=True,
            fast_sampling_config={"length": 3},
            state_override=state,
            dataset_override=ds,
            base_save_dir=str(tmp_path / "gen"),
            batch_size=16,
            compute_emd=False,
        )
        assert len(results) == 1
        assert np.isfinite(results[0].avg_cd)
        h5s = glob.glob(str(tmp_path / "gen" / "**" / "*.h5"), recursive=True)
        assert h5s, "no generated h5 written"
        assert "fast_sampling" in h5s[0]
