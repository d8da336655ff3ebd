"""Small pointwise baseline denoiser.

Reference: pointnet2/models/pointwise_net.py — six ConcatSquashLinear layers
gated by [beta, sin(beta), cos(beta)] time features concatenated with the
Pnet2Stage global feature of the condition cloud; its own (padded) linear
variance schedule.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .pnet import Pnet2Stage


def pointwise_variance_schedule(num_steps: int, beta_1: float, beta_T: float):
    """VarianceSchedule with leading zero padding (pointwise_net.py:8-48).
    Returns betas of shape (num_steps + 1,), betas[0] = 0."""
    betas = np.concatenate([[0.0], np.linspace(beta_1, beta_T, num_steps)])
    return jnp.asarray(betas, dtype=jnp.float32)


class ConcatSquashLinear(nn.Module):
    features: int

    @nn.compact
    def __call__(self, ctx, x):
        gate = jax.nn.sigmoid(nn.Dense(self.features)(ctx))
        bias = nn.Dense(self.features, use_bias=False)(ctx)
        return nn.Dense(self.features)(x) * gate + bias


class PointwiseNet(nn.Module):
    residual: bool = True
    num_steps: int = 1000
    beta_1: float = 1e-4
    beta_T: float = 0.05
    mode: str = "linear"
    pnet_global_feature_architecture: Sequence[Sequence[int]] = (
        (3, 128, 256),
        (512, 1024),
    )
    global_feature_remove_last_activation: bool = False
    layer_dims: Sequence[int] = (128, 256, 512, 256, 128, 3)

    @nn.compact
    def __call__(self, x, condition, ts=None, label=None):
        # x: (B, N, 3); condition: (B, M, C); ts: (B,)
        if ts is None:
            ts = jnp.zeros((x.shape[0],), dtype=jnp.int32)
        ts = ts.astype(jnp.int32)
        betas = pointwise_variance_schedule(self.num_steps, self.beta_1, self.beta_T)
        beta = betas[ts][:, None, None]  # (B, 1, 1)
        arch = self.pnet_global_feature_architecture
        context = Pnet2Stage(
            tuple(arch[0]), tuple(arch[1]), bn=False,
            remove_last_activation=self.global_feature_remove_last_activation,
        )(condition)[:, None, :]  # (B, 1, F)
        time_emb = jnp.concatenate([beta, jnp.sin(beta), jnp.cos(beta)], axis=-1)
        ctx = jnp.concatenate([time_emb, context], axis=-1)  # (B, 1, F+3)

        out = x
        n = len(self.layer_dims)
        for i, f in enumerate(self.layer_dims):
            out = ConcatSquashLinear(f)(ctx, out)
            if i < n - 1:
                out = jax.nn.leaky_relu(out, negative_slope=0.01)
        return x + out if self.residual else out
