"""End-to-end slices: training steps (completion + refine), sampling, and the
multi-chip dry run on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_diffusion_refinement_tpu import diffusion
from point_diffusion_refinement_tpu.config import tiny_pointnet_config
from point_diffusion_refinement_tpu.models import PointNet2CloudCondition
from point_diffusion_refinement_tpu.parallel import make_mesh, shard_batch
from point_diffusion_refinement_tpu.sample import make_coarse_sampler, make_refiner, unaugment
from point_diffusion_refinement_tpu.train import (
    QuantityScheduler,
    create_train_state,
    jit_step_for_mesh,
    make_completion_train_step,
    make_refine_train_step,
)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = tiny_pointnet_config()
    model = PointNet2CloudCondition.from_config(cfg)
    rng = np.random.default_rng(3)
    B, N, M = 4, 48, 64
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


class TestCompletionTraining:
    def test_loss_decreases(self, tiny_setup):
        model, params, x, cond, label = tiny_setup
        schedule = diffusion.calc_diffusion_hyperparams(50, 1e-4, 0.02)
        state, tx = create_train_state(params, jax.random.key(1), 1e-3)
        step = jax.jit(make_completion_train_step(model, schedule, tx))
        losses = []
        for _ in range(12):
            state, loss = step(state, x, cond, label)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-3:]) < np.mean(losses[:3])

    def test_multichip_dryrun(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_mesh_step_matches_single_device(self, tiny_setup):
        """The sharded step must compute the same loss as the unsharded one."""
        model, params, x, cond, label = tiny_setup
        schedule = diffusion.calc_diffusion_hyperparams(20, 1e-4, 0.02)
        state, tx = create_train_state(params, jax.random.key(5))
        step = make_completion_train_step(model, schedule, tx)
        _, loss_single = jax.jit(step)(state, x, cond, label)

        mesh = make_mesh(4, model_parallel=2)
        state2, _ = create_train_state(params, jax.random.key(5))
        jitted, state2 = jit_step_for_mesh(step, mesh, state2, n_array_args=3)
        _, loss_mesh = jitted(state2, *shard_batch((x, cond, label), mesh))
        np.testing.assert_allclose(
            float(loss_single), float(loss_mesh), rtol=1e-4, atol=1e-5
        )


class TestRefineTraining:
    def test_refine_step_runs(self, tiny_setup):
        cfg = tiny_pointnet_config(include_t=False)
        model = PointNet2CloudCondition.from_config(cfg)
        rng = np.random.default_rng(0)
        B, N, M = 2, 32, 48
        x = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
        gen = x + 0.05 * jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
        cond = jnp.asarray(
            np.concatenate(
                [rng.uniform(-1, 1, (B, M, 3)), np.ones((B, M, 1))], axis=-1
            ).astype(np.float32)
        )
        label = jnp.zeros((B,), jnp.int32)
        params = model.init(jax.random.key(0), gen, cond, None, label)
        state, tx = create_train_state(params, jax.random.key(1), 1e-3)
        step = jax.jit(
            make_refine_train_step(model, tx, scale=1.0, cd_loss_type="cd_t")
        )
        losses = []
        for i in range(6):
            state, loss = step(state, x, cond, label, gen, jnp.float32(0.001))
            losses.append(float(loss))
        assert np.isfinite(losses).all()

    def test_upsample_refine_step(self):
        cfg = tiny_pointnet_config(include_t=False)
        cfg["point_upsample_factor"] = 2
        model = PointNet2CloudCondition.from_config(cfg)
        rng = np.random.default_rng(0)
        B, N, M = 2, 24, 48
        x = jnp.asarray(rng.uniform(-1, 1, (B, 2 * N, 3)).astype(np.float32))
        gen = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
        cond = jnp.asarray(
            np.concatenate(
                [rng.uniform(-1, 1, (B, M, 3)), np.ones((B, M, 1))], axis=-1
            ).astype(np.float32)
        )
        label = jnp.zeros((B,), jnp.int32)
        params = model.init(jax.random.key(0), gen, cond, None, label)
        state, tx = create_train_state(params, jax.random.key(1))
        step = jax.jit(
            make_refine_train_step(
                model, tx, point_upsample_factor=2, intermediate_loss_weight=0.5
            )
        )
        state, loss = step(state, x, cond, label, gen, jnp.float32(0.001))
        assert np.isfinite(float(loss))


class TestSampling:
    def test_coarse_sampler_shapes(self, tiny_setup):
        model, params, x, cond, label = tiny_setup
        schedule = diffusion.calc_diffusion_hyperparams(8, 1e-4, 0.02)
        sampler = jax.jit(make_coarse_sampler(model, schedule, num_points=48))
        out = sampler(params, jax.random.key(0), cond, label)
        assert out.shape == (cond.shape[0], 48, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_fastdpm_sampler(self, tiny_setup):
        model, params, x, cond, label = tiny_setup
        schedule = diffusion.calc_diffusion_hyperparams(100, 1e-4, 0.02)
        plan = diffusion.make_fast_sampling_plan(
            schedule, 100, 1e-4, 0.02, length=5, sampling_method="var",
            noise_schedule="quadratic", kappa=0.5,
        )
        sampler = jax.jit(
            make_coarse_sampler(model, schedule, num_points=48, fast_plan=plan)
        )
        out = sampler(params, jax.random.key(0), cond, label)
        assert out.shape == (cond.shape[0], 48, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_refiner(self, tiny_setup):
        cfg = tiny_pointnet_config(include_t=False)
        model = PointNet2CloudCondition.from_config(cfg)
        rng = np.random.default_rng(0)
        B, N, M = 2, 32, 48
        gen = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
        cond = jnp.asarray(
            np.concatenate(
                [rng.uniform(-1, 1, (B, M, 3)), np.ones((B, M, 1))], axis=-1
            ).astype(np.float32)
        )
        label = jnp.zeros((B,), jnp.int32)
        params = model.init(jax.random.key(0), gen, cond, None, label)
        refine = jax.jit(make_refiner(model))
        out = refine(params, gen, cond, label, jnp.float32(0.001))
        assert out.shape == gen.shape
        # displacement is scaled by 1e-3: refined stays near the coarse input
        assert float(jnp.abs(out - gen).max()) < 0.1

    def test_unaugment_inverts_augment(self, rng_np):
        x = rng_np.uniform(-1, 1, (2, 20, 3)).astype(np.float32)
        theta = 0.7
        M = np.asarray(
            [[np.cos(theta), 0, np.sin(theta)], [0, 1, 0], [-np.sin(theta), 0, np.cos(theta)]],
            dtype=np.float32,
        ) * 1.1
        t = rng_np.uniform(-0.1, 0.1, (1, 3)).astype(np.float32)
        aug = x @ M.T + t
        M_inv = np.linalg.inv(M.T).astype(np.float32)
        rec = unaugment(
            jnp.asarray(aug),
            jnp.broadcast_to(jnp.asarray(M_inv), (2, 3, 3)),
            jnp.asarray(t),
        )
        np.testing.assert_allclose(np.asarray(rec), x, rtol=1e-3, atol=1e-5)


class TestQuantityScheduler:
    def test_linear_clamp(self):
        s = QuantityScheduler(0, 10, 0.01, 0.001, 100)
        assert s.get_quantity(0) == pytest.approx(0.01)
        assert s.get_quantity(500) == pytest.approx(0.0055)
        assert s.get_quantity(1000) == pytest.approx(0.001)
        assert s.get_quantity(99999) == pytest.approx(0.001)
        assert s.get_quantity(-5) == pytest.approx(0.01)


class TestSegmentedSampling:
    def test_segmented_equals_single_scan(self, tiny_setup):
        """Chunked device executions must reproduce the single-scan sampler
        up to fusion-order rounding (same rng split structure)."""
        model, params, x, cond, label = tiny_setup
        schedule = diffusion.calc_diffusion_hyperparams(10, 1e-4, 0.02)
        full = make_coarse_sampler(model, schedule, num_points=48)
        seg = make_coarse_sampler(model, schedule, num_points=48, segment_size=3)
        rng = jax.random.key(5)
        a = np.asarray(full(params, rng, cond, label))
        b = np.asarray(seg(params, rng, cond, label))
        # identical rng/math; differences are per-compilation fusion-order
        # rounding amplified across steps
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)

    def test_segmented_t_slices(self, tiny_setup):
        model, params, x, cond, label = tiny_setup
        schedule = diffusion.calc_diffusion_hyperparams(10, 1e-4, 0.02)
        seg = make_coarse_sampler(
            model, schedule, num_points=48, segment_size=4, t_slices=[2, 7]
        )
        out, slices = seg(params, jax.random.key(0), cond, label)
        assert set(slices) == {2, 7}
        assert slices[2].shape == out.shape


class TestTrainLoopEval:
    def test_eval_in_loop_writes_records(self, tmp_path):
        """Full config-driven training with eval-in-loop on synthetic data:
        checkpoints + eval pickles + gathered result must appear."""
        import os

        from point_diffusion_refinement_tpu.data import write_mvp_style_h5
        from point_diffusion_refinement_tpu.train.loop import train

        data_dir = write_mvp_style_h5(
            str(tmp_path / "mvp"), num_shapes=2, npoints=48, partial_points=32
        )
        config = {
            "diffusion_config": {"T": 8, "beta_0": 1e-4, "beta_T": 0.02},
            "pointnet_config": {**tiny_pointnet_config(), "model_name": "loop_eval"},
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
            },
        }
        res = train(config)
        ck = res["output_directory"]
        assert any(d.startswith("pointnet_ckpt_") for d in os.listdir(ck))
        assert res["eval_records"]["iter"], "eval never ran"
        eval_dir = os.path.join(os.path.dirname(os.path.dirname(ck)), "loop_eval")
        # gathered file lives under <root>/<local_path>/eval_result
        import glob

        gathered = glob.glob(
            os.path.join(config["train_config"]["root_directory"], "**",
                         "gathered_eval_result.pkl"), recursive=True,
        )
        assert gathered, "gathered eval result missing"
