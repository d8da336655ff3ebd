"""Two-stage PointNet global feature encoder.

Reference: pointnet2/models/pnet.py:7-40 (Pnet2Stage): mlp -> max-pool ->
concat pooled with per-point -> mlp -> max-pool -> (B, mlp2[-1]) global
feature of the partial cloud.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import ConditionedMLP


class Pnet2Stage(nn.Module):
    """mlp1/mlp2 are the reference's full specs, e.g. [4,128,256], [512,1024]
    from pnet_global_feature_architecture; the second stage input is
    [feature, pooled] with 2*mlp1[-1] channels."""

    mlp1: Sequence[int]
    mlp2: Sequence[int]
    bn: bool = True
    remove_last_activation: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        # x: (B, N, C) channels-last
        h = x[:, :, None, :]  # (B, N, 1, C)
        h = ConditionedMLP(
            tuple(self.mlp1[1:]), bn=self.bn, bias=True,
            trim_last=self.remove_last_activation, dtype=self.dtype,
        )(h)
        pooled = jnp.max(h, axis=1, keepdims=True)  # (B, 1, 1, C1)
        pooled_b = jnp.broadcast_to(pooled, h.shape)
        h = jnp.concatenate([h, pooled_b], axis=-1)
        h = ConditionedMLP(
            tuple(self.mlp2), bn=self.bn, bias=True,
            trim_last=self.remove_last_activation, dtype=self.dtype,
        )(h)
        return jnp.max(h, axis=1)[:, 0, :]  # (B, mlp2[-1])
