"""DDPM schedule math and timestep embeddings.

Reference: pointnet2/util.py:126-181 (calc_diffusion_hyperparams,
calc_diffusion_step_embedding) and util.py:297-314 (calc_t_emb).
Schedules are computed on host in float64 numpy and shipped to device as a
frozen pytree of float32 arrays — nothing here is traced.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Linear-beta DDPM hyperparameters (util.py:154-181)."""

    beta: jax.Array  # (T,)
    alpha: jax.Array  # (T,)
    alpha_bar: jax.Array  # (T,)
    sigma: jax.Array  # (T,)  sqrt of beta_tilde

    @property
    def T(self) -> int:
        return self.beta.shape[0]


def calc_diffusion_hyperparams(T: int, beta_0: float, beta_T: float) -> DiffusionSchedule:
    beta = np.linspace(beta_0, beta_T, T, dtype=np.float64)
    alpha = 1.0 - beta
    alpha_bar = np.cumprod(alpha)
    # beta_tilde_t = beta_t * (1 - abar_{t-1}) / (1 - abar_t);  beta_tilde_0 = beta_0
    beta_tilde = beta.copy()
    beta_tilde[1:] = beta[1:] * (1.0 - alpha_bar[:-1]) / (1.0 - alpha_bar[1:])
    sigma = np.sqrt(beta_tilde)
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DiffusionSchedule(
        beta=f32(beta), alpha=f32(alpha), alpha_bar=f32(alpha_bar), sigma=f32(sigma)
    )


def calc_t_emb(ts: jax.Array, t_emb_dim: int) -> jax.Array:
    """Sinusoidal timestep embedding (util.py:297-314).

    Args:
      ts: (B,) float or int timesteps (FastDPM VAR sampling passes fractional
        steps, so we keep float).
      t_emb_dim: even embedding width.

    Returns:
      (B, t_emb_dim) = [sin(t * w), cos(t * w)] with w_i = 10000^{-i/(h-1)}.
    """
    assert t_emb_dim % 2 == 0
    half = t_emb_dim // 2
    freq = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-np.log(10000.0) / (half - 1))
    )
    arg = ts.astype(jnp.float32)[:, None] * freq[None, :]
    return jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=1)
