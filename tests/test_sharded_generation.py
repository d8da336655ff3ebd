"""Mesh-sharded generation/eval: SPMD sampling equals single-device sampling,
per-rank result gathering, XT warm-start end-to-end plumbing, and trainset
eval during training.  Replaces the reference's DataParallel inference
(completion_eval.py:113-118) and per-rank generation subprocess + filesystem
merge (generate_samples_distributed.py:26-97,186-203)."""

import glob
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_diffusion_refinement_tpu import diffusion
from point_diffusion_refinement_tpu.config import tiny_pointnet_config
from point_diffusion_refinement_tpu.models import PointNet2CloudCondition
from point_diffusion_refinement_tpu.parallel import make_mesh, pad_batch_rows
from point_diffusion_refinement_tpu.sample import make_coarse_sampler
from point_diffusion_refinement_tpu.sample.pipeline import (
    gather_generated_results,
    run_generation,
)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = tiny_pointnet_config()
    model = PointNet2CloudCondition.from_config(cfg)
    rng = np.random.default_rng(7)
    B, N, M = 8, 48, 64
    x = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    cond = jnp.asarray(
        np.concatenate(
            [rng.uniform(-1, 1, (B, M, 3)), np.ones((B, M, 1))], axis=-1
        ).astype(np.float32)
    )
    label = jnp.zeros((B,), jnp.int32)
    params = model.init(
        jax.random.key(0), x, cond, jnp.zeros((B,), jnp.float32), label
    )
    return model, params, x, cond, label


class TestShardedSampling:
    def test_segmented_sharded_matches_single_device(self, tiny_setup):
        """Same rng, same math: the mesh only changes placement, so sharded
        generation must reproduce single-device generation."""
        model, params, x, cond, label = tiny_setup
        schedule = diffusion.calc_diffusion_hyperparams(10, 1e-4, 0.02)
        single = make_coarse_sampler(model, schedule, num_points=48, segment_size=4)
        mesh = make_mesh(8)
        sharded = make_coarse_sampler(
            model, schedule, num_points=48, segment_size=4, mesh=mesh
        )
        rng = jax.random.key(11)
        a = np.asarray(single(params, rng, cond, label))
        b_dev = sharded(params, rng, cond, label)
        # output really is distributed over the data axis
        assert len(b_dev.sharding.device_set) == 8
        b = np.asarray(b_dev)
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)

    def test_single_scan_sharded_matches(self, tiny_setup):
        model, params, x, cond, label = tiny_setup
        schedule = diffusion.calc_diffusion_hyperparams(6, 1e-4, 0.02)
        single = jax.jit(make_coarse_sampler(model, schedule, num_points=48))
        mesh = make_mesh(4)
        sharded = jax.jit(
            make_coarse_sampler(model, schedule, num_points=48, mesh=mesh)
        )
        rng = jax.random.key(3)
        a = np.asarray(single(params, rng, cond, label))
        b = np.asarray(sharded(params, rng, cond, label))
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)

    def test_pad_batch_rows(self):
        arr = np.arange(10 * 2).reshape(10, 2)
        padded = pad_batch_rows(arr, 8)
        assert padded.shape == (16, 2)
        np.testing.assert_array_equal(padded[:10], arr)
        np.testing.assert_array_equal(padded[10:], np.repeat(arr[-1:], 6, axis=0))
        assert pad_batch_rows(arr, 5) is arr or pad_batch_rows(arr, 5).shape == (10, 2)


class TestGatherGeneratedResults:
    def test_merges_rank_h5_and_pickles(self, tmp_path):
        import h5py

        parent = str(tmp_path / "gen")
        world = 3
        rng = np.random.default_rng(0)
        chunks, cds = [], []
        for r in range(world):
            d = os.path.join(parent, f"rank_{r}")
            os.makedirs(d)
            data = rng.uniform(-1, 1, (2 + r, 16, 3)).astype(np.float32)
            chunks.append(data)
            with h5py.File(os.path.join(d, "mvp_generated_data_16pts.h5"), "w") as f:
                f["data"] = data
            cd = rng.uniform(0, 1, (2 + r,)).astype(np.float64)
            cds.append(cd)
            with open(os.path.join(d, "eval_result.pkl"), "wb") as f:
                pickle.dump(
                    {
                        "avg_cd": float(cd.mean()),
                        "avg_emd": 0.0,
                        "metrics": {
                            "cd_distance": cd,
                            "emd_distance": np.zeros_like(cd),
                            "cd_p": cd,
                            "f1": cd,
                        },
                        "labels": np.full((2 + r,), r, np.int64),
                    },
                    f,
                )
        merged = gather_generated_results(parent, world)
        assert merged == os.path.join(parent, "mvp_generated_data_16pts.h5")
        with h5py.File(merged, "r") as f:
            np.testing.assert_allclose(
                np.array(f["data"]), np.concatenate(chunks, axis=0)
            )
        with open(os.path.join(parent, "eval_result.pkl"), "rb") as f:
            payload = pickle.load(f)
        np.testing.assert_allclose(
            payload["metrics"]["cd_distance"], np.concatenate(cds)
        )
        assert payload["avg_cd"] == pytest.approx(float(np.concatenate(cds).mean()))

    def test_missing_rank_dir_returns_none(self, tmp_path):
        os.makedirs(tmp_path / "rank_0")
        assert gather_generated_results(str(tmp_path), 2) is None


class _ArrayDataset:
    """Minimal dataset-override: a dict of equal-length arrays."""

    def __init__(self, **arrays):
        self.arrays = arrays
        self.n = len(next(iter(arrays.values())))

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {k: v[i] for k, v in self.arrays.items()}


class TestRunGenerationSharded:
    def test_mesh_run_with_ragged_batch(self, tiny_setup, tmp_path):
        """run_generation over the 8-device mesh with a dataset size that
        does not divide the data axis — the padding path must keep metrics
        for exactly the real rows."""
        model, params, x, cond, label = tiny_setup
        from point_diffusion_refinement_tpu.train.step import create_train_state

        state, _ = create_train_state(params, jax.random.key(0))
        n = 11  # ragged vs 8 devices
        rng = np.random.default_rng(5)
        ds = _ArrayDataset(
            partial=np.concatenate([np.asarray(cond)] * 2)[:n],
            complete=np.concatenate([np.asarray(x)] * 2)[:n],
            label=np.zeros((n,), np.int64),
        )
        config = {
            "diffusion_config": {"T": 6, "beta_0": 1e-4, "beta_T": 0.02},
            "pointnet_config": tiny_pointnet_config(),
            "train_config": {"task": "completion", "root_directory": str(tmp_path)},
            "mvp_dataset_config": {
                "data_dir": str(tmp_path),
                "npoints": 48,
                "eval_batch_size": 8,
                "scale": 1,
            },
        }
        mesh = make_mesh(8)
        results = run_generation(
            config,
            state_override=state,
            dataset_override=ds,
            save_generated=True,
            base_save_dir=str(tmp_path / "gen"),
            compute_emd=False,
            segment_size=3,
            mesh=mesh,
        )
        res = results[0]
        assert res.metrics["cd_distance"].shape == (n,)
        assert np.isfinite(res.metrics["cd_distance"]).all()
        # clouds + per-rank eval pickle on disk (world==1: no rank dirs)
        h5s = glob.glob(str(tmp_path / "gen" / "**" / "*.h5"), recursive=True)
        assert h5s
        pkls = glob.glob(
            str(tmp_path / "gen" / "**" / "eval_result.pkl"), recursive=True
        )
        assert pkls


class TestXTWarmStartRoundTrip:
    def test_generate_slice_then_warm_start(self, tiny_setup, tmp_path):
        """The reference pipeline: generate with a t-slice capture at T_step
        -> the *_T{t}.h5 lands on disk -> reload through the config
        (load_pre_computed_XT) -> warm-started generation consumes
        batch['XT'] (generate_samples.py:312-315,374-406,
        mvp_dataset.py:88-99)."""
        from point_diffusion_refinement_tpu.data import write_mvp_style_h5
        from point_diffusion_refinement_tpu.train.step import create_train_state

        model, _, _, _, _ = tiny_setup
        T_step = 4
        npoints = 48
        data_dir = write_mvp_style_h5(
            str(tmp_path / "mvp"), num_shapes=1, npoints=npoints, partial_points=64
        )
        # the synthetic dataset's partials are plain 3-channel clouds
        rng = np.random.default_rng(0)
        params = model.init(
            jax.random.key(0),
            jnp.asarray(rng.uniform(-1, 1, (2, npoints, 3)).astype(np.float32)),
            jnp.asarray(rng.uniform(-1, 1, (2, 64, 3)).astype(np.float32)),
            jnp.zeros((2,), jnp.float32),
            jnp.zeros((2,), jnp.int32),
        )
        state, _ = create_train_state(params, jax.random.key(0))
        config = {
            "diffusion_config": {"T": 6, "beta_0": 1e-4, "beta_T": 0.02},
            "pointnet_config": tiny_pointnet_config(),
            "train_config": {"task": "completion", "root_directory": str(tmp_path)},
            "mvp_dataset_config": {
                "data_dir": data_dir,
                "npoints": npoints,
                "eval_batch_size": 13,
                "scale": 1,
                "novel_input": False,
            },
        }
        base = str(tmp_path / "gen")
        # pass 1: capture the noise-free slice at T_step
        run_generation(
            config,
            state_override=state,
            save_generated=True,
            base_save_dir=base,
            compute_emd=False,
            segment_size=3,
            t_slices=[T_step],
        )
        slice_files = glob.glob(
            os.path.join(base, "**", f"*_T{T_step}.h5"), recursive=True
        )
        assert slice_files, "t-slice h5 was not written"
        # the dataset expects the reference's fixed name
        # (mvp_dataset.py:95: mvp_generated_data_2048pts_T{t}.h5)
        xt_dir = str(tmp_path / "xt" / "test")
        os.makedirs(xt_dir)
        import shutil

        shutil.copy(
            slice_files[0],
            os.path.join(xt_dir, f"mvp_generated_data_2048pts_T{T_step}.h5"),
        )
        # pass 2: warm start from the precomputed XT via config plumbing only
        results = run_generation(
            config,
            state_override=state,
            save_generated=False,
            compute_emd=False,
            segment_size=3,
            use_a_precomputed_XT=True,
            T_step=T_step,
            XT_folder=str(tmp_path / "xt"),
        )
        res = results[0]
        assert np.isfinite(res.metrics["cd_distance"]).all()
        assert res.metrics["cd_distance"].shape[0] == 26  # 1 shape x 26 views


class TestTrainsetEvalDuringTraining:
    def test_trainset_pickles_written(self, tmp_path):
        from point_diffusion_refinement_tpu.data import write_mvp_style_h5
        from point_diffusion_refinement_tpu.train.loop import train

        data_dir = write_mvp_style_h5(
            str(tmp_path / "mvp"), num_shapes=2, npoints=48, partial_points=32
        )
        config = {
            "diffusion_config": {"T": 6, "beta_0": 1e-4, "beta_T": 0.02},
            "pointnet_config": {**tiny_pointnet_config(), "model_name": "ts_eval"},
            "train_config": {
                "task": "completion",
                "root_directory": str(tmp_path / "exp"),
                "output_directory": "ckpt",
                "tensorboard_directory": "tb",
                "ckpt_iter": "max",
                "epochs_per_ckpt": 1,
                "iters_per_logging": 100,
                "n_epochs": 1,
                "learning_rate": 1e-3,
                "conditioned_on_cloud": True,
                "compute_emd": False,
            },
            "mvp_dataset_config": {
                "data_dir": data_dir,
                "npoints": 48,
                "scale": 1,
                "batch_size": 16,
                "eval_batch_size": 16,
                "num_samples_tested": 16,
                "test_trainset_during_eval": True,
            },
        }
        res = train(config)
        assert res["eval_records"]["iter"], "eval never ran"
        eval_dirs = glob.glob(
            str(tmp_path / "exp" / "**" / "eval_result"), recursive=True
        )
        assert eval_dirs
        files = os.listdir(eval_dirs[0])
        assert any(f.endswith("_rank_0.pkl") for f in files), files
        assert any(f.endswith("_rank_0_trainset.pkl") for f in files), files
        assert any(
            f.startswith("eval_result_ckpt_") and "_rank_" not in f for f in files
        ), files
