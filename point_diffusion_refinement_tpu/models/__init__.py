"""Flax model zoo: dual-path conditional denoiser, pointwise baseline,
upsampling, and the building-block modules."""

from .common import ConditionedMLP, PartialGroupNorm, SharedMLP, pool_features, swish
from .attention import AttentionPool, GlobalSelfAttention
from .grouping import query_and_group, group_knn_features, group_all, Grouped
from .pnet import Pnet2Stage
from .modules import (
    SetAbstraction,
    FeaturePropagation,
    KnnFeaturePropagation,
    FeatureTransfer,
)
from .condition_net import PointNet2CloudCondition, CondFeatures
from .pointwise_net import PointwiseNet, ConcatSquashLinear
from .upsample import point_upsample
from .model_config import freeze_config, FrozenCfg

__all__ = [
    "ConditionedMLP",
    "PartialGroupNorm",
    "SharedMLP",
    "pool_features",
    "swish",
    "AttentionPool",
    "GlobalSelfAttention",
    "query_and_group",
    "group_knn_features",
    "group_all",
    "Grouped",
    "Pnet2Stage",
    "SetAbstraction",
    "FeaturePropagation",
    "KnnFeaturePropagation",
    "FeatureTransfer",
    "PointNet2CloudCondition",
    "CondFeatures",
    "PointwiseNet",
    "ConcatSquashLinear",
    "point_upsample",
    "freeze_config",
    "FrozenCfg",
]
