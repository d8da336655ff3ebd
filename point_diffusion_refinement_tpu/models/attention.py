"""Attention pooling over neighbor groups and global self-attention.

Reference: pointnet2_ops/attention.py:35-154 (AttentionModule,
GlobalAttentionModule).  Channels-last layout; the softmax over the K
neighbor slots is count-masked exactly as attention.py:84-90.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.neighbors import count_to_mask
from .common import PartialGroupNorm


class _GNParams(nn.Module):
    """Bare GroupNorm affine params — named ``GroupNorm_0`` by its parent so
    the param tree matches a real ``PartialGroupNorm``'s child exactly."""

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


class _DenseParams(nn.Module):
    """Bare ``nn.Dense`` parameters (same names, shapes, inits) so the fused
    Pallas attention path builds a param tree identical to the XLA path's."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_dim, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return kernel, bias


class _PGNParams(nn.Module):
    """Bare ``PartialGroupNorm`` parameters (child ``GroupNorm_0``)."""

    features: int

    @nn.compact
    def __call__(self):
        return _GNParams(self.features, name="GroupNorm_0")()


def _fused_attention_enabled() -> bool:
    """Opt-in (PDR_FUSED_ATTENTION=1).  Measured NEGATIVE on v5e (B=4,
    shipped config): the 3-sweep fused kernel ran the FT-0 attention pair at
    ~1.9 ms/step (P3 0.59 + P2 0.2 + P1 0.19 each, plus 0.8 ms of layout
    copies at the pallas boundary — XLA holds the big grouped tensors
    M-minor) vs ~0.4 ms for XLA's own stats+value fusions; full step 11.4 vs
    5.2 ms.  XLA's convert_reduce fusions already emit (stats, bf16 value)
    in one pass, so the recompute sweeps only add work.  Kept parity-tested
    (tests/test_pallas_attention.py) as infrastructure; a win would need
    the producer (windowed grouping kernel) to emit attention inputs
    directly so the (B, M, K, C) tensors never hit HBM at all."""
    import os

    return os.environ.get("PDR_FUSED_ATTENTION", "0") == "1"


class _SplitConcatGroupNorm(nn.Module):
    """PartialGroupNorm of ``concat([broadcast_K(q), k], -1)`` computed
    WITHOUT materializing the (B, M, K, C1+C2) concatenation.

    Per-(batch, group) statistics reduce over (M, K, channels-in-group); q is
    constant over the K axis, so its per-channel sums enter with weight K and
    the group moments factor exactly across the q/k channel boundary.  The
    per-channel affine then keeps the q half K-independent, so the normalized
    halves are returned separately: ``(qn (B,M,C1), kn (B,M,K,C2))``.

    Matches flax GroupNorm numerics: f32 reductions, fast variance
    ``max(0, E[x^2] - E[x]^2)``, eps 1e-5; trailing ``C % num_groups``
    channels pass through untouched (PartialGroupNorm / MyGroupNorm,
    pointnet2_modules.py:23-40).  The param tree is identical to
    ``PartialGroupNorm`` (child ``GroupNorm_0`` with scale/bias of the
    normalized width), so checkpoints convert 1:1.
    """

    num_groups: int
    k_slots: int  # K, static
    dtype: object = None  # output dtype; None keeps the f32 promotion

    @nn.compact
    def __call__(self, q, k, k_stats=None):
        """``k_stats``: optional externally computed f32 per-channel
        ``(sum, sum-of-squares)`` of ``k`` over its (M, K) axes, each
        (B, C2) — computed next to k's producing matmul so the reduce fuses
        into that epilogue instead of re-reading the (B, M, K, C2) tensor."""
        c1 = int(q.shape[-1])
        c2 = int(k.shape[-1])
        c = c1 + c2
        normed_c = c - c % self.num_groups
        if normed_c == 0:
            return q, k
        scale, bias = _GNParams(normed_c, name="GroupNorm_0")()
        gs = normed_c // self.num_groups
        K = float(self.k_slots)
        M = q.shape[1]
        cnt = float(M) * float(self.k_slots) * gs

        xq = q.astype(jnp.float32)
        xk = k.astype(jnp.float32)
        if k_stats is not None:
            sum_k, ssq_k = k_stats
        else:
            sum_k = jnp.sum(xk, axis=(1, 2))
            ssq_k = jnp.sum(xk * xk, axis=(1, 2))
        sum_c = jnp.concatenate(
            [jnp.sum(xq, axis=1) * K, sum_k], axis=-1
        )[:, :normed_c]  # (B, normed_c) per-channel sums, q weighted by K
        ssq_c = jnp.concatenate(
            [jnp.sum(xq * xq, axis=1) * K, ssq_k], axis=-1
        )[:, :normed_c]
        B = sum_c.shape[0]
        mean = sum_c.reshape(B, self.num_groups, gs).sum(-1) / cnt
        var = jnp.maximum(
            ssq_c.reshape(B, self.num_groups, gs).sum(-1) / cnt - mean * mean,
            0.0,
        )
        rstd = jax.lax.rsqrt(var + 1e-5)  # torch/flax eps
        mul = jnp.repeat(rstd, gs, axis=-1) * scale[None]  # (B, normed_c)
        add = bias[None] - jnp.repeat(mean, gs, axis=-1) * mul

        nq = min(c1, normed_c)  # q channels that are normalized (all, in practice)
        if self.dtype is not None and q.dtype == self.dtype == k.dtype:
            # bf16 compute: apply the affine in the compute dtype directly on
            # the original tensors.  The f32 path below makes the big (B, M,
            # K, C2) activation a TWO-consumer f32 value (stats reduce +
            # affine), so XLA materializes a full f32 copy of it in HBM
            # (measured as dual (f32, bf16) fusion outputs, ~43 MB per large
            # attention instance per step); with a bf16 affine the f32
            # conversion only feeds the reduces and fuses away.  mul and add
            # round to bf16 separately and the multiply-add runs in bf16, so
            # values can differ from round_bf16(f32 affine) by a few bf16
            # ulps (measured bound asserted in
            # tests/test_round4_fixes.py::TestBf16PathDrift).
            d = self.dtype
            qn = q[..., :nq] * mul[:, None, :nq].astype(d) \
                + add[:, None, :nq].astype(d)
            if nq < c1:
                qn = jnp.concatenate([qn, q[..., nq:]], axis=-1)
            nk = normed_c - nq
            kn = k[..., :nk] * mul[:, None, None, nq:].astype(d) \
                + add[:, None, None, nq:].astype(d)
            if nk < c2:
                kn = jnp.concatenate([kn, k[..., nk:]], axis=-1)
            return qn, kn
        qn = xq[..., :nq] * mul[:, None, :nq] + add[:, None, :nq]
        if nq < c1:
            qn = jnp.concatenate([qn, xq[..., nq:]], axis=-1)
        nk = normed_c - nq
        kn = xk[..., :nk] * mul[:, None, None, nq:] + add[:, None, None, nq:]
        if nk < c2:
            kn = jnp.concatenate([kn, xk[..., nk:]], axis=-1)
        out_dtype = self.dtype or jnp.float32
        return qn.astype(out_dtype), kn.astype(out_dtype)


class _SplitDense(nn.Module):
    """``nn.Dense`` over ``concat([broadcast_K(q), k], -1)`` without the
    broadcast/concat: the kernel splits at the q/k channel boundary into a
    per-center (K-free) matmul and a grouped matmul.  Param tree and
    initialization are identical to ``nn.Dense`` on the concatenated input.
    Returns ``(q_part (B,M,F), k_part (B,M,K,F))`` with the bias folded into
    the k part; the caller adds them (broadcasting q over K).
    """

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, q, k):
        in_dim = int(q.shape[-1]) + int(k.shape[-1])
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_dim, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        q, k, kernel, bias = nn.dtypes.promote_dtype(
            q, k, kernel, bias, dtype=self.dtype
        )
        c1 = q.shape[-1]
        qp = q @ kernel[:c1]
        kp = k @ kernel[c1:] + bias
        return qp, kp


class AttentionPool(nn.Module):
    """Per-neighborhood attention pooling (AttentionModule, attention.py:35-96).

    query:   feat             (B, M, Cq)      — feature at the center point
    key:     grouped_feat     (B, M, K, Ck)   — raw grouped features
    value:   grouped_feat_out (B, M, K, Cout) — MLP output
    counts:  (B, M) int or 'all'

    Scores are an MLP over [conv(query) broadcast, conv(key)]; softmax over K
    with invalid slots masked to -1e9; output is the weighted value sum.

    TPU restructuring (value-equivalent, verified against the torch reference
    in tests/test_reference_parity.py): the reference broadcasts conv(query)
    to every neighbor slot and concatenates before its BN + conv stack
    (attention.py:41-57) — on TPU that materializes a (B, M, K, C1+C2)
    tensor several times over in HBM.  Since the q half is constant over K,
    the first GroupNorm's group statistics factor across the q/k channel
    boundary and the following 1x1 conv splits into a per-center matmul
    (K-free) plus a grouped matmul; the two halves only meet at the
    relu(q_part + k_part) of the *narrow* (inter_c-wide) hidden layer.
    """

    out_features: int
    attention_bn: bool = True
    transform_grouped_feat_out: bool = True
    last_activation: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, feat, grouped_feat, grouped_feat_out, counts,
                 fused=False, key_pre=None, key_stats=None):
        """``key_pre``: externally computed ``Dense_1(grouped_feat)`` (from a
        merged matmul that reads the grouped tensor once for all its
        consumers); the key Dense is then skipped (explicitly named, so the
        parameter tree is unchanged).  ``key_stats``: precomputed f32
        (sum, ssq) of relu(key_pre) over (M, K), for the GroupNorm."""
        K = grouped_feat.shape[-2]
        c_out = self.out_features
        c1 = max(feat.shape[-1], 32)
        c2 = (
            int(key_pre.shape[-1])
            if key_pre is not None
            else max(grouped_feat.shape[-1], 32)
        )
        inter_c = min(c1 + c2, c_out)

        # Fused Pallas path (inference only — no VJP): the whole
        # score+softmax+weighted-sum chain runs tile-resident in VMEM
        # (ops/pallas_attention.py) with a param tree identical to the XLA
        # path below.  Only the shipped all-flags-true configuration is
        # fused; anything else keeps the unfused path.
        if (
            fused
            and self.dtype == jnp.bfloat16
            and self.attention_bn
            and self.transform_grouped_feat_out
            and self.last_activation
            and key_pre is None
            and _fused_attention_enabled()
        ):
            from ..ops.pallas_attention import fused_attention_pool

            normed0 = (c1 + c2) - (c1 + c2) % min(32, c1 + c2)
            normed1 = inter_c - inter_c % min(32, inter_c)
            normed2 = c_out - c_out % min(32, c_out)
            w0, b0 = _DenseParams(feat.shape[-1], c1, name="Dense_0")()
            w1, b1 = _DenseParams(grouped_feat.shape[-1], c2, name="Dense_1")()
            s0, bb0 = _PGNParams(normed0, name="PartialGroupNorm_0")()
            w2, b2 = _DenseParams(c1 + c2, inter_c, name="Dense_2")()
            s1, bb1 = _PGNParams(normed1, name="PartialGroupNorm_1")()
            w3, b3 = _DenseParams(inter_c, c_out, name="Dense_3")()
            w4, b4 = _DenseParams(grouped_feat_out.shape[-1], c_out,
                                  name="Dense_4")()
            s2, bb2 = _PGNParams(normed2, name="PartialGroupNorm_2")()
            cnt = None if isinstance(counts, str) else counts
            return fused_attention_pool(
                feat, grouped_feat, grouped_feat_out, cnt,
                w0, b0, w1, b1, s0, bb0, w2, b2, s1, bb1, w3, b3,
                w4, b4, s2, bb2,
                c1=c1, c2=c2, inter_c=inter_c, c_out=c_out, K=K,
                interpret=jax.default_backend() != "tpu",
            )

        q = nn.Dense(c1, dtype=self.dtype, name="Dense_0")(feat)  # (B, M, C1)
        if key_pre is not None:
            k = key_pre
        else:
            k = nn.Dense(c2, dtype=self.dtype, name="Dense_1")(grouped_feat)

        hq = jnp.maximum(q, 0.0)  # ReLU precedes the norm (attention.py:46-57)
        hk = jnp.maximum(k, 0.0)
        if self.attention_bn:
            hq, hk = _SplitConcatGroupNorm(
                min(32, c1 + c2), K, dtype=self.dtype,
                name="PartialGroupNorm_0",
            )(hq, hk, k_stats=key_stats)
        qp, kp = _SplitDense(inter_c, self.dtype, name="Dense_2")(hq, hk)
        h = jnp.maximum(qp[:, :, None, :] + kp, 0.0)  # (B, M, K, inter_c)
        if self.attention_bn:
            h = PartialGroupNorm(
                min(32, inter_c), dtype=self.dtype, name="PartialGroupNorm_1"
            )(h)
        scores = nn.Dense(c_out, dtype=self.dtype, name="Dense_3")(h)

        if not (isinstance(counts, str) and counts == "all"):
            c = jnp.maximum(counts, 1)
            mask = count_to_mask(c, K)[..., None].astype(scores.dtype)  # (B,M,K,1)
            scores = scores * mask + (-1e9) * (1.0 - mask)
        weight = nn.softmax(scores.astype(jnp.float32), axis=-2)  # softmax over K, f32

        v = grouped_feat_out
        if self.transform_grouped_feat_out:
            v = nn.Dense(c_out, dtype=self.dtype, name="Dense_4")(v)
            if self.last_activation:
                if self.attention_bn:
                    v = PartialGroupNorm(
                        min(32, c_out), dtype=self.dtype,
                        name="PartialGroupNorm_2",
                    )(v)
                v = jnp.maximum(v, 0.0)
        if self.dtype is not None and v.dtype == self.dtype:
            # bf16 compute: round the softmax weights to the compute dtype
            # (halving the HBM bytes of the (B, M, K, C_out) weight tensor
            # and keeping the v*weight product pass bf16) but ACCUMULATE the
            # K-axis sum in f32 inside the reduce fusion — the convex
            # combination keeps full f32 precision where it matters.
            w = weight.astype(self.dtype)
            return jnp.sum(
                v * w, axis=-2, dtype=jnp.float32
            ).astype(self.dtype)
        return jnp.sum(v * weight, axis=-2)  # (B, M, C_out)


class GlobalSelfAttention(nn.Module):
    """Full NxN self-attention with pairwise-concat MLP scores
    (GlobalAttentionModule, attention.py:98-154).

    Reference quirk, reproduced for value/checkpoint parity (verified in
    tests/test_reference_parity.py): the reference's final combine is
    ``(value.unsqueeze(-1) * weight).sum(dim=-1)`` — value is indexed by the
    QUERY axis and broadcast over the key axis, so the softmax-normalized
    sum collapses to exactly ``value``.  The module's observable behavior is
    value_conv (+ norm/relu); the NxN score branch never influences the
    output.  We keep the score parameters (so reference checkpoints convert
    1:1) but skip the dead O(N^2 C) compute the reference burns.

    Set ``true_attention=True`` for the (non-reference) fixed semantics that
    actually attends over keys — available for new models.

    Input feat (B, N, C + additional_dim) where the trailing additional_dim
    channels are raw coordinates; output (B, N, C).
    """

    features: int  # C (without additional_dim)
    attention_bn: bool = True
    last_activation: bool = True
    true_attention: bool = False

    @nn.compact
    def __call__(self, feat):
        C = self.features
        key = nn.Dense(C)(feat)  # (B, N, C)
        query = nn.Dense(C)(feat)
        value = nn.Dense(C)(feat)
        if self.last_activation:
            if self.attention_bn:
                value = PartialGroupNorm(min(32, C))(value)
            value = jnp.maximum(value, 0.0)

        if not self.true_attention:
            # instantiate the score parameters on a K=1 slice (checkpoint
            # shape-compatible); the result is unused and DCE'd by XLA
            qk1 = jnp.concatenate([query[:, :, None, :], key[:, :1, None, :].repeat(query.shape[1], axis=1)], axis=-1)
            h = jnp.maximum(qk1, 0.0)
            if self.attention_bn:
                h = PartialGroupNorm(min(32, 2 * C))(h)
            h = nn.Dense(C)(h)
            h = jnp.maximum(h, 0.0)
            if self.attention_bn:
                h = PartialGroupNorm(min(32, C))(h)
            nn.Dense(C)(h)
            return value

        N = feat.shape[1]
        qk = jnp.concatenate(
            [
                jnp.broadcast_to(query[:, :, None, :], (feat.shape[0], N, N, C)),
                jnp.broadcast_to(key[:, None, :, :], (feat.shape[0], N, N, C)),
            ],
            axis=-1,
        )  # (B, N, N, 2C) = [query_i, key_j]
        h = jnp.maximum(qk, 0.0)
        if self.attention_bn:
            h = PartialGroupNorm(min(32, 2 * C))(h)
        h = nn.Dense(C)(h)
        h = jnp.maximum(h, 0.0)
        if self.attention_bn:
            h = PartialGroupNorm(min(32, C))(h)
        score = nn.Dense(C)(h)  # (B, N, N, C)
        weight = nn.softmax(score, axis=2)  # over the key axis
        return jnp.einsum(
            "bnmc,bmc->bnc", weight, value, preferred_element_type=jnp.float32
        )
