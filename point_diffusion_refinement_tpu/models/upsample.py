"""Refinement-time point upsampling.

Reference: models/point_upsample_module.py:4-28 — split the network's
displacement output into a center displacement plus a grid of per-point
offsets scaled by 1/sqrt(factor), producing N*factor refined points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def point_upsample(
    coarse: jax.Array,
    displacement: jax.Array,
    point_upsample_factor: int,
    include_displacement_center_to_final_output: bool,
    output_scale_factor_value: float,
) -> tuple[jax.Array, jax.Array]:
    """Args:
      coarse: (B, N, 3); displacement: (B, N, 3*F) or (B, N, 3*(F+1)).

    Returns:
      (refined (B, N*F, 3), intermediate (B, N, 3)).
    """
    F = point_upsample_factor
    grid_scale = 1.0 / np.sqrt(F)
    center = displacement[:, :, 0:3]
    grid = displacement[:, :, 3:] * grid_scale
    intermediate = coarse + center * output_scale_factor_value

    B, N, _ = coarse.shape
    per_point = F - 1 if include_displacement_center_to_final_output else F
    grid = grid.reshape(B, N, per_point, 3)
    upsampled = intermediate[:, :, None, :] + grid * output_scale_factor_value
    upsampled = upsampled.reshape(B, N * per_point, 3)
    if include_displacement_center_to_final_output:
        refined = jnp.concatenate([upsampled, intermediate], axis=1)
    else:
        refined = upsampled
    return refined, intermediate
