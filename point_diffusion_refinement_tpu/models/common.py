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
import numpy as np


def swish(x):
    return x * jax.nn.sigmoid(x)


ACTIVATIONS = {"relu": jax.nn.relu, "swish": swish}


class _GNScaleBias(nn.Module):
    """Parameter container named like an ``nn.GroupNorm`` child so the
    fused PartialGroupNorm below keeps a checkpoint-identical tree."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return scale, bias


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

    TPU note: rather than slicing head/tail and concatenating (two extra
    full-tensor relayout passes at awkward lane widths like C=41), the
    normalization is applied as ONE fused affine ``(x - mu) * s + b`` over
    the whole tensor, with identity lanes (mu=0, s=1, b=0) covering the
    passthrough tail.  The math and reduction order match flax
    ``nn.GroupNorm`` (use_fast_variance, f32 stats); ``dtype`` sets the
    output dtype — None keeps the f32 promotion the unfused form produced,
    bfloat16 halves the bytes of every normalized intermediate (exactly
    value-preserving through a following relu, since rounding commutes
    with monotone clamps).
    """

    num_groups: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, stats=None):
        """``stats``: optional externally computed per-channel f32
        ``(sum, sum-of-squares)`` over the spatial axes (each (B, >=C)) —
        used by the packed-first-layer path so the reduction fuses into the
        producing matmul's epilogue instead of re-reading the tensor."""
        c = x.shape[-1]
        normed_c = c - c % self.num_groups
        if normed_c == 0:
            return x
        scale, bias = _GNScaleBias(normed_c, name="GroupNorm_0")()
        B = x.shape[0]
        g = self.num_groups
        cg = normed_c // g
        # Stats via per-CHANNEL sums first: the big-tensor reduction keeps C
        # on the lane axis (the tensor's natural layout), so XLA does not
        # relayout (B, M, K, C) to M-minor just for the group reduction —
        # the group combine then runs on the tiny (B, C) sums.
        spatial = tuple(range(1, x.ndim - 1))
        cnt = float(np.prod([x.shape[a] for a in spatial])) * cg
        if stats is not None:
            sum_c = stats[0][:, :normed_c]
            ssq_c = stats[1][:, :normed_c]
        else:
            head = x[..., :normed_c].astype(jnp.float32)
            sum_c = jnp.sum(head, axis=spatial)               # (B, normed_c)
            ssq_c = jnp.sum(jnp.square(head), axis=spatial)
        mean = sum_c.reshape(B, g, cg).sum(-1) / cnt          # (B, g)
        var = jnp.maximum(
            ssq_c.reshape(B, g, cg).sum(-1) / cnt - jnp.square(mean), 0.0
        )
        inv = jax.lax.rsqrt(var + 1e-5)                       # torch eps
        to_c = lambda a: jnp.broadcast_to(
            a[:, :, None], (B, g, cg)
        ).reshape(B, normed_c)
        mu = to_c(mean)
        s = to_c(inv) * scale[None, :]
        b = jnp.broadcast_to(bias[None, :], (B, normed_c))
        if normed_c != c:
            pad = c - normed_c
            mu = jnp.concatenate([mu, jnp.zeros((B, pad), jnp.float32)], 1)
            s = jnp.concatenate([s, jnp.ones((B, pad), jnp.float32)], 1)
            b = jnp.concatenate([b, jnp.zeros((B, pad), jnp.float32)], 1)
        shp = (B,) + (1,) * (x.ndim - 2) + (c,)
        if self.dtype is not None and x.dtype == self.dtype:
            # bf16 compute: apply the affine in the compute dtype — the
            # output is rounded to it anyway, and keeping the elementwise
            # pass bf16 stops XLA from materializing an f32 copy of x for
            # the two (stats + affine) consumers
            d = self.dtype
            y = (x - mu.reshape(shp).astype(d)) * s.reshape(shp).astype(d) \
                + b.reshape(shp).astype(d)
            return y
        y = (x.astype(jnp.float32) - mu.reshape(shp)) * s.reshape(shp) + b.reshape(shp)
        return y.astype(self.dtype or jnp.float32)


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
    def __call__(self, x, first_pre: bool = False, first_stats=None):
        """``first_pre=True``: ``x`` is already the FIRST Dense layer's output
        (computed externally as part of a merged multi-head matmul so the
        grouped input tensor is read from HBM once, not once per consumer);
        skip that Dense and run the remaining norm/act/layers.  Only
        meaningful for bn_first=False (Dense-first) stacks.  Layer names are
        explicit (matching the auto-assigned ones) so the skip cannot shift
        the parameter tree.  ``first_stats``: optional precomputed
        (sum, ssq) GroupNorm statistics of the precomputed first layer."""
        act = ACTIVATIONS[self.activation]
        n = len(self.features)
        if first_pre:
            assert not self.bn_first
        for i, f in enumerate(self.features):
            if self.bn_first:
                if self.bn:
                    x = PartialGroupNorm(
                        min(32, x.shape[-1]), dtype=self.dtype,
                        name=f"PartialGroupNorm_{i}",
                    )(x)
                x = act(x)
                x = nn.Dense(
                    f, use_bias=self.bias, dtype=self.dtype, name=f"Dense_{i}"
                )(x)
            else:
                if not (first_pre and i == 0):
                    x = nn.Dense(
                        f, use_bias=self.bias, dtype=self.dtype,
                        name=f"Dense_{i}",
                    )(x)
                last = i == n - 1
                if not (self.trim_last and last):
                    if self.bn:
                        x = PartialGroupNorm(
                            32, dtype=self.dtype,
                            name=f"PartialGroupNorm_{i}",
                        )(x, stats=first_stats if (first_pre and i == 0) else None)
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
    # inference marker (windowed/fused upstream kernels have no VJP); the
    # whole-chain Pallas kernel that once hung off this flag measured 7.9x
    # vs 10.2x baseline (narrow-C lane padding + underfilled single-block
    # matmuls) and was pruned in round 4 — see STATUS.md negative results
    fused: bool = False

    def res_dense_name(self) -> str:
        """Name of the residual-projection Dense, reproducing flax's
        auto-numbering (construction order: first_conv, t-proj, cond-proj,
        second-cond-proj, residual)."""
        i = (
            int(self.first_conv_features is not None)
            + int(self.include_t)
            + int(self.include_condition)
            + int(self.include_second_condition)
        )
        return f"Dense_{i}"

    @nn.compact
    def __call__(self, feature, t_emb=None, condition_emb=None,
                 second_condition_emb=None, first_pre=None, res_pre=None,
                 first_stats=None):
        """``first_pre``/``res_pre``: externally computed first-Dense output /
        residual-projection output (from a merged matmul that reads the
        grouped input once for all its consumers — see
        modules._packed_first_layers).  Dense layers are explicitly named in
        the auto-assignment order so skipping them cannot shift the
        parameter tree."""
        assert len(self.features) >= 2
        if self.include_second_condition:
            assert len(self.features) >= 3
        mk = lambda feats, trim=False: SharedMLP(
            feats, bn=self.bn, bn_first=self.bn_first, bias=self.bias,
            activation=self.activation, trim_last=trim, dtype=self.dtype,
        )
        di = [0]

        def _dname():
            n = f"Dense_{di[0]}"
            di[0] += 1
            return n

        if self.first_conv_features is not None:
            assert first_pre is None
            feature = nn.Dense(
                self.first_conv_features, use_bias=self.bias,
                dtype=self.dtype, name=_dname(),
            )(feature)

        has_rest = len(self.features) > 2
        if first_pre is not None:
            assert not self.bn_first
            h = mk(self.features[:1])(
                first_pre, first_pre=True, first_stats=first_stats
            )
        else:
            h = mk(self.features[:1])(feature)
        if self.include_t:
            assert t_emb is not None
            t1 = nn.Dense(
                self.features[0], dtype=self.dtype, name=_dname()
            )(t_emb)  # (B, f0)
            h = h + t1[:, None, None, :]
        else:
            assert t_emb is None

        h = mk(self.features[1:2], trim=self.trim_last and not has_rest)(h)
        if self.include_condition:
            assert condition_emb is not None
            c1 = nn.Dense(
                self.features[1], dtype=self.dtype, name=_dname()
            )(condition_emb)
            h = h + c1[:, None, None, :]
        else:
            assert condition_emb is None

        if has_rest:
            h = mk(self.features[2:], trim=self.trim_last)(h)
        if self.include_second_condition:
            assert second_condition_emb is not None
            c2 = nn.Dense(
                self.features[-1], dtype=self.dtype, name=_dname()
            )(second_condition_emb)
            h = h + c2[:, None, None, :]
        else:
            assert second_condition_emb is None

        if self.res_connect:
            if res_pre is not None:
                h = h + res_pre
            elif feature.shape[-1] == self.features[-1]:
                h = h + feature
            else:
                h = h + nn.Dense(
                    self.features[-1], use_bias=self.bias, dtype=self.dtype,
                    name=_dname(),
                )(feature)
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
