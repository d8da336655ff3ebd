"""Fixed-shape geometry ops for point clouds — the TPU-native analogue of the
reference's CUDA extension packages (pointnet2_ops, PytorchEMD, chamfer)."""

from .sampling import furthest_point_sample, gather_points, group_points
from .neighbors import (
    pairwise_sqdist,
    ball_query,
    knn,
    count_to_mask,
    masked_mean,
)
from .interpolate import three_nn, three_interpolate, inverse_distance_weights
from .chamfer import chamfer_distance, calc_cd, fscore, nn_sqdist
from .emd import earth_mover_distance, approx_match

__all__ = [
    "furthest_point_sample",
    "gather_points",
    "group_points",
    "pairwise_sqdist",
    "ball_query",
    "knn",
    "count_to_mask",
    "masked_mean",
    "three_nn",
    "three_interpolate",
    "inverse_distance_weights",
    "chamfer_distance",
    "calc_cd",
    "fscore",
    "nn_sqdist",
    "earth_mover_distance",
    "approx_match",
]
