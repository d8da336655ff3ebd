"""FastDPM accelerated sampling (VAR / STEP schedules, generalized DDIM).

Reference: pointnet2/util_fastdpmv2.py:186-476.  All schedule searches
(bisection for the VAR beta endpoint, continuous-step adaptation via a
Stirling log-Gamma approximation) run on host in float64 numpy; the device
program is a `lax.scan` over T_user steps whose per-step affine coefficients
(scale, eps coefficient, sigma, fractional timestep tau) are precomputed
host-side into arrays — the TPU never sees data-dependent control flow.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .ddpm import DenoiseFn
from .schedule import DiffusionSchedule


def bisearch(f, domain, target, eps=1e-8):
    """Smallest x with f(x) > target (util_fastdpmv2.py:186-209)."""
    sign = -1 if target < 0 else 1
    left, right = domain
    x = (left + right) / 2
    for _ in range(1000):
        x = (left + right) / 2
        if f(x) < target:
            right = x
        elif f(x) > (1 + sign * eps) * target:
            left = x
        else:
            break
    return x


def get_VAR_noise(S: int, T: int, beta_0: float, beta_T: float, schedule="linear"):
    """VAR noise levels matching total noise of the full schedule
    (util_fastdpmv2.py:212-236)."""
    target = np.prod(1 - np.linspace(beta_0, beta_T, T))
    if schedule == "linear":
        g = lambda x: np.linspace(beta_0, x, S)
        domain = (beta_0, 0.99)
    elif schedule == "quadratic":
        g = lambda x: np.array([beta_0 * (1 + i * x) ** 2 for i in range(S)])
        domain = (0.0, 0.95 / np.sqrt(beta_0) / S)
    else:
        raise NotImplementedError(schedule)
    f = lambda x: np.prod(1 - g(x))
    largest_var = bisearch(f, domain, target, eps=1e-4)
    return g(largest_var)


def get_STEP_step(S: int, T: int, schedule="linear"):
    """STEP subsequence of timesteps (util_fastdpmv2.py:239-258)."""
    if schedule == "linear":
        c = (T - 1.0) / (S - 1.0)
        list_tau = [np.floor(i * c) for i in range(S)]
    elif schedule == "quadratic":
        list_tau = np.linspace(0, np.sqrt(T * 0.8), S) ** 2
    else:
        raise NotImplementedError(schedule)
    return [int(s) for s in list_tau]


def _log_gamma(x):
    # Stirling: Gamma(x+1) ~= sqrt(2 pi x) (x/e)^x (1 + 1/12x)
    y = x - 1
    return np.log(2 * np.pi * y) / 2 + y * (np.log(y) - 1) + np.log(1 + 1 / (12 * y))


def _log_cont_noise(t, beta_0, beta_T, T):
    delta_beta = (beta_T - beta_0) / (T - 1)
    _c = (1.0 - beta_0) / delta_beta
    t_1 = t + 1
    return t_1 * np.log(delta_beta) + _log_gamma(_c + 1) - _log_gamma(_c - t_1 + 1)


def precompute_VAR_steps(
    alpha_bar: np.ndarray, beta_0: float, beta_T: float, user_defined_eta: np.ndarray
):
    """Map the VAR noise schedule onto fractional timesteps of the trained
    model (util_fastdpmv2.py:275-304)."""
    T = len(alpha_bar)
    T_user = len(user_defined_eta)
    gamma_bar = np.cumprod(1 - user_defined_eta)
    # small slack: schedule arrays round-trip through float32 on device
    assert gamma_bar[0] <= alpha_bar[0] * (1 + 1e-6)
    assert gamma_bar[-1] >= alpha_bar[-1] * (1 - 1e-4)
    continuous_steps = []
    for t in range(T_user - 1, -1, -1):
        t_adapted = None
        for i in range(T - 1):
            if alpha_bar[i] >= gamma_bar[t] > alpha_bar[i + 1]:
                t_adapted = bisearch(
                    f=lambda _t: _log_cont_noise(_t, beta_0, beta_T, T),
                    domain=(i - 0.01, i + 1.01),
                    target=np.log(gamma_bar[t]),
                )
                break
        if t_adapted is None:
            t_adapted = T - 1
        continuous_steps.append(t_adapted)  # decreasing
    return continuous_steps


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FastSamplingPlan:
    """Per-step affine coefficients for the generalized-DDIM update.

    The update (util_fastdpmv2.py:364-373 and 435-444) is:
        x <- x * scale + c * eps_theta + sigma * z
    with tau the (possibly fractional) timestep fed to the network.
    """

    tau: jax.Array  # (S,) float32 timesteps
    scale: jax.Array  # (S,)
    c: jax.Array  # (S,)
    sigma: jax.Array  # (S,)


def _plan_from_gamma(taus, gamma_bar, kappa: float) -> FastSamplingPlan:
    """Shared math of VAR_sampling / STEP_sampling: given the decreasing
    sequence of (tau_i, gamma_bar_i) build the per-step coefficients."""
    S = len(taus)
    scale = np.zeros(S)
    c = np.zeros(S)
    sigma = np.zeros(S)
    for i in range(S):
        cur = gamma_bar[i]
        if i == S - 1:
            alpha_next, sig = 1.0, 0.0
        else:
            alpha_next = gamma_bar[i + 1]
            sig = kappa * np.sqrt((1 - alpha_next) / (1 - cur) * (1 - cur / alpha_next))
        scale[i] = np.sqrt(alpha_next / cur)
        c[i] = np.sqrt(1 - alpha_next - sig ** 2) - np.sqrt(1 - cur) * np.sqrt(
            alpha_next / cur
        )
        sigma[i] = sig
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return FastSamplingPlan(tau=f32(taus), scale=f32(scale), c=f32(c), sigma=f32(sigma))


def make_fast_sampling_plan(
    schedule: DiffusionSchedule,
    T: int,
    beta_0: float,
    beta_T: float,
    length: int = 100,
    sampling_method: str = "var",
    noise_schedule: str = "quadratic",
    kappa: float = 0.5,
) -> FastSamplingPlan:
    """Host-side plan builder dispatching VAR/STEP
    (util_fastdpmv2.py:455-476)."""
    assert sampling_method in ("var", "step")
    assert noise_schedule in ("linear", "quadratic")
    # recompute in float64: the device schedule is float32, and the bracket
    # search in precompute_VAR_steps needs alpha_bar[0] == 1 - beta_0 exactly
    alpha_bar = np.cumprod(1.0 - np.linspace(beta_0, beta_T, T))
    if sampling_method == "var":
        eta = get_VAR_noise(length, T, beta_0, beta_T, noise_schedule)
        taus = precompute_VAR_steps(alpha_bar, beta_0, beta_T, eta)
        gamma_bar_all = np.cumprod(1 - eta)
        # loop i visits gamma_bar[T_user-1-i]; taus is already decreasing
        gamma = gamma_bar_all[::-1]
    else:
        steps = sorted(get_STEP_step(length, T, noise_schedule), reverse=True)
        taus = [float(s) for s in steps]
        gamma = alpha_bar[np.asarray(steps, dtype=np.int64)]
    return _plan_from_gamma(np.asarray(taus, dtype=np.float64), np.asarray(gamma), kappa)


def fast_sampling(
    rng: jax.Array,
    denoise_fn: DenoiseFn,
    shape: tuple[int, ...],
    plan: FastSamplingPlan,
) -> jax.Array:
    """Run the generalized-DDIM scan for a precomputed plan."""
    B = shape[0]
    rng_init, rng_loop = jax.random.split(rng)
    x = jax.random.normal(rng_init, shape, dtype=jnp.float32)

    def body(carry, step):
        x, rng = carry
        tau, scale, c, sigma = step
        rng, rng_z = jax.random.split(rng)
        ts = jnp.full((B,), tau, dtype=jnp.float32)
        eps = denoise_fn(x, ts)
        z = jax.random.normal(rng_z, x.shape, dtype=x.dtype)
        x = x * scale + c * eps + sigma * z
        return (x, rng), None

    (x, _), _ = jax.lax.scan(
        body, (x, rng_loop), (plan.tau, plan.scale, plan.c, plan.sigma)
    )
    return x
