"""Golden-value tests for the diffusion schedule, DDPM loop, and FastDPM math
against literal numpy ports of pointnet2/util.py and util_fastdpmv2.py."""

import numpy as np
import jax
import jax.numpy as jnp

from point_diffusion_refinement_tpu import diffusion


def np_schedule(T, b0, bT):
    beta = np.linspace(b0, bT, T)
    alpha = 1 - beta
    abar = np.cumprod(alpha)
    btld = beta.copy()
    for t in range(1, T):
        btld[t] *= (1 - abar[t - 1]) / (1 - abar[t])
    return beta, alpha, abar, np.sqrt(btld)


class TestSchedule:
    def test_golden(self):
        sch = diffusion.calc_diffusion_hyperparams(1000, 1e-4, 0.02)
        beta, alpha, abar, sigma = np_schedule(1000, 1e-4, 0.02)
        np.testing.assert_allclose(np.asarray(sch.beta), beta, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sch.alpha), alpha, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sch.alpha_bar), abar, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sch.sigma), sigma, rtol=1e-5)

    def test_t_emb_matches_reference_formula(self):
        # util.py:297-314
        ts = jnp.asarray([0.0, 1.0, 500.0, 999.0])
        emb = np.asarray(diffusion.calc_t_emb(ts, 128))
        half = 64
        w = np.exp(np.arange(half) * -(np.log(10000) / (half - 1)))
        arg = np.asarray(ts)[:, None] * w[None]
        want = np.concatenate([np.sin(arg), np.cos(arg)], 1)
        # f32 sin/cos of args up to ~1000 vs numpy f64: allow small abs error
        np.testing.assert_allclose(emb, want, rtol=1e-4, atol=3e-3)


class TestDDPM:
    def test_training_loss_with_perfect_net_is_zero(self):
        sch = diffusion.calc_diffusion_hyperparams(100, 1e-4, 0.02)
        x0 = jnp.zeros((4, 16, 3))
        # with x0=0: x_t = sqrt(1-abar)*z, so a "perfect" eps-net can recover
        # z = x_t / sqrt(1-abar_t)
        def perfect(x, ts):
            ab = sch.alpha_bar[ts.astype(jnp.int32)][:, None, None]
            return x / jnp.sqrt(1 - ab)

        loss = diffusion.training_loss(jax.random.key(0), perfect, x0, sch)
        assert float(loss) < 1e-8

    def test_sampling_identity_matches_numpy_loop(self):
        # drive both with eps == x and the same per-step update; compare final.
        T = 20
        sch = diffusion.calc_diffusion_hyperparams(T, 1e-4, 0.02)
        B, N = 2, 8
        shape = (B, N, 3)
        denoise = lambda x, ts: x
        # run our scan with noise disabled by monkeypatching sigma to 0
        sch0 = diffusion.DiffusionSchedule(
            beta=sch.beta, alpha=sch.alpha, alpha_bar=sch.alpha_bar,
            sigma=jnp.zeros_like(sch.sigma),
        )
        rng = jax.random.key(1)
        got = np.asarray(diffusion.sampling(rng, denoise, shape, sch0))
        # numpy replay with the same initial x
        rng_init, _ = jax.random.split(rng)
        x = np.asarray(jax.random.normal(rng_init, shape, dtype=jnp.float32))
        alpha = np.asarray(sch.alpha)
        abar = np.asarray(sch.alpha_bar)
        for t in range(T - 1, -1, -1):
            eps = x
            x = (x - (1 - alpha[t]) / np.sqrt(1 - abar[t]) * eps) / np.sqrt(alpha[t])
        np.testing.assert_allclose(got, x, rtol=1e-4, atol=1e-5)

    def test_t_slices_and_warm_start(self):
        T = 30
        sch = diffusion.calc_diffusion_hyperparams(T, 1e-4, 0.02)
        shape = (1, 4, 3)
        denoise = lambda x, ts: jnp.zeros_like(x)
        x0, slices = diffusion.sampling(
            jax.random.key(0), denoise, shape, sch, t_slices=[5, 10]
        )
        assert set(slices) == {5, 10}
        assert slices[5].shape == shape
        # warm start from XT at step 10 runs only 10 steps
        XT = jnp.ones(shape)
        out = diffusion.sampling(
            jax.random.key(0), denoise, shape, sch, XT=XT, warm_start_step=10
        )
        assert out.shape == shape


class TestFastDPM:
    def test_var_noise_total_matches(self):
        T, b0, bT = 1000, 1e-4, 0.02
        eta = diffusion.get_VAR_noise(50, T, b0, bT, "quadratic")
        assert len(eta) == 50
        target = np.prod(1 - np.linspace(b0, bT, T))
        got = np.prod(1 - eta)
        np.testing.assert_allclose(got, target, rtol=2e-2)

    def test_step_steps(self):
        steps = diffusion.get_STEP_step(10, 1000, "linear")
        assert steps[0] == 0 and steps[-1] == 999
        assert all(b > a for a, b in zip(steps, steps[1:]))

    def test_all_plan_combinations_shapes(self):
        # mirrors util_fastdpmv2.py:479-495 shape checker with identity net
        sch = diffusion.calc_diffusion_hyperparams(1000, 1e-4, 0.02)
        denoise = lambda x, ts: x
        shape = (2, 16, 3)
        for method in ("var", "step"):
            for noise_sched in ("linear", "quadratic"):
                for kappa in (0.0, 0.5, 1.0):
                    plan = diffusion.make_fast_sampling_plan(
                        sch, 1000, 1e-4, 0.02, length=10,
                        sampling_method=method, noise_schedule=noise_sched,
                        kappa=kappa,
                    )
                    assert plan.tau.shape == (10,)
                    x = diffusion.fast_sampling(jax.random.key(0), denoise, shape, plan)
                    assert x.shape == shape
                    assert np.isfinite(np.asarray(x)).all()

    def test_var_taus_decreasing(self):
        sch = diffusion.calc_diffusion_hyperparams(1000, 1e-4, 0.02)
        plan = diffusion.make_fast_sampling_plan(
            sch, 1000, 1e-4, 0.02, length=50, sampling_method="var",
            noise_schedule="quadratic", kappa=0.5,
        )
        tau = np.asarray(plan.tau)
        assert (np.diff(tau) < 0).all()
        assert tau[0] > 900 and tau[-1] < 1.0
