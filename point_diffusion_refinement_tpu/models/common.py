"""Shared building blocks: partial group norm, the conditioned MLP block,
and neighbor pooling.

Reference: pointnet2_ops/pointnet2_modules.py:13-206 (swish, MyGroupNorm,
build_shared_mlp, Mlp_plus_t_emb, pooling_features).  Layout is channels-last
(B, M, K, C): the reference's 1x1 Conv2d over (B, C, M, K) becomes a Dense on
the trailing axis, which XLA lowers to an MXU matmul with (M*K, C) tiles.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def swish(x):
    return x * jax.nn.sigmoid(x)


ACTIVATIONS = {"relu": jax.nn.relu, "swish": swish}


class PartialGroupNorm(nn.Module):
    """GroupNorm over the first ``C - C % num_groups`` channels; trailing
    channels (appended raw positions) pass through untouched.

    Mirrors MyGroupNorm (pointnet2_modules.py:23-40) exactly, including its
    corner case: with C < num_groups, ``C - C % num_groups == 0`` and NO
    channel is normalized (torch builds a GroupNorm over 0 channels).  The
    reference's bn_first=False layers construct MyGroupNorm(32, C) without a
    min, so narrow layers silently skip normalization — reproduced here for
    checkpoint parity (value-verified in tests/test_reference_parity.py).
    Statistics are per (sample, group) over the group's channels and all
    spatial axes, matching torch.nn.GroupNorm on BCHW.
    """

    num_groups: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        normed_c = c - c % self.num_groups
        if normed_c == 0:
            return x
        gn = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5)  # torch eps
        if normed_c == c:
            return gn(x)
        head, tail = x[..., :normed_c], x[..., normed_c:]
        return jnp.concatenate([gn(head), tail], axis=-1)


class SharedMLP(nn.Module):
    """Stack of Dense(+norm+activation) layers — build_shared_mlp
    (pointnet2_modules.py:42-67).

    bn_first=True: [GN(in_ch, groups=min(32,in_ch)), act, Dense] per layer.
    bn_first=False: [Dense, GN(out_ch, groups=32), act] per layer.
    ``trim_last``: drop the trailing norm+act of the final layer (used by
    Pnet2Stage's remove_last_activation, pnet.py:15-25).
    """

    features: Sequence[int]
    bn: bool = True
    bn_first: bool = False
    bias: bool = False
    activation: str = "relu"
    trim_last: bool = False
    dtype: object = None  # compute dtype (e.g. bfloat16); params stay f32

    @nn.compact
    def __call__(self, x):
        act = ACTIVATIONS[self.activation]
        n = len(self.features)
        for i, f in enumerate(self.features):
            if self.bn_first:
                if self.bn:
                    x = PartialGroupNorm(min(32, x.shape[-1]))(x)
                x = act(x)
                x = nn.Dense(f, use_bias=self.bias, dtype=self.dtype)(x)
            else:
                x = nn.Dense(f, use_bias=self.bias, dtype=self.dtype)(x)
                last = i == n - 1
                if not (self.trim_last and last):
                    if self.bn:
                        x = PartialGroupNorm(32)(x)
                    x = act(x)
        return x


class ConditionedMLP(nn.Module):
    """The core conditioned block — Mlp_plus_t_emb
    (pointnet2_modules.py:69-174).

    Structure on input h (B, M, K, C):
      [first_conv] -> mlp1 -> (+ Dense(t_emb))
                   -> mlp2 -> (+ Dense(condition_emb))
                   -> rest  -> (+ Dense(second_condition_emb))
      + residual(input after first_conv)

    ``features`` are the reference's mlp_spec[1:] (output width of each Dense;
    the input width is inferred).  The t injection lands after features[0],
    the condition injection after features[1], the second condition after the
    last layer.  ``first_conv_features`` adds the optional leading Dense
    (mlp_spec[0]).
    """

    features: Sequence[int]
    include_t: bool = False
    include_condition: bool = False
    include_second_condition: bool = False
    bn: bool = True
    bn_first: bool = False
    bias: bool = False
    first_conv_features: Optional[int] = None
    res_connect: bool = False
    activation: str = "relu"
    trim_last: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, feature, t_emb=None, condition_emb=None, second_condition_emb=None):
        assert len(self.features) >= 2
        if self.include_second_condition:
            assert len(self.features) >= 3
        mk = lambda feats, trim=False: SharedMLP(
            feats, bn=self.bn, bn_first=self.bn_first, bias=self.bias,
            activation=self.activation, trim_last=trim, dtype=self.dtype,
        )

        if self.first_conv_features is not None:
            feature = nn.Dense(self.first_conv_features, use_bias=self.bias, dtype=self.dtype)(feature)

        has_rest = len(self.features) > 2
        h = mk(self.features[:1])(feature)
        if self.include_t:
            assert t_emb is not None
            t1 = nn.Dense(self.features[0], dtype=self.dtype)(t_emb)  # (B, f0)
            h = h + t1[:, None, None, :]
        else:
            assert t_emb is None

        h = mk(self.features[1:2], trim=self.trim_last and not has_rest)(h)
        if self.include_condition:
            assert condition_emb is not None
            c1 = nn.Dense(self.features[1], dtype=self.dtype)(condition_emb)
            h = h + c1[:, None, None, :]
        else:
            assert condition_emb is None

        if has_rest:
            h = mk(self.features[2:], trim=self.trim_last)(h)
        if self.include_second_condition:
            assert second_condition_emb is not None
            c2 = nn.Dense(self.features[-1], dtype=self.dtype)(second_condition_emb)
            h = h + c2[:, None, None, :]
        else:
            assert second_condition_emb is None

        if self.res_connect:
            if feature.shape[-1] == self.features[-1]:
                h = h + feature
            else:
                h = h + nn.Dense(self.features[-1], use_bias=self.bias, dtype=self.dtype)(feature)
        return h


def pool_features(feature, counts, pooling: str = "max"):
    """Pool (B, M, K, C) over the neighbor axis K -> (B, M, C).

    Mirrors pooling_features (pointnet2_modules.py:177-206): 'max' ignores
    counts (padded slots repeat real neighbors so max is unaffected); 'avg'
    is count-masked; 'avg_max'/'max_avg' maxes the first half of the channels
    and averages the second half.
    """
    from ..ops.neighbors import masked_mean

    if pooling == "max":
        return jnp.max(feature, axis=-2)
    if pooling == "avg":
        return masked_mean(feature, counts)
    if "avg" in pooling and "max" in pooling:
        half = feature.shape[-1] // 2
        mx = jnp.max(feature[..., :half], axis=-2)
        av = masked_mean(feature[..., half:], counts)
        return jnp.concatenate([mx, av], axis=-1)
    raise ValueError(f"{pooling} pooling is not supported")
