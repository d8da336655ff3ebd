"""Attention pooling over neighbor groups and global self-attention.

Reference: pointnet2_ops/attention.py:35-154 (AttentionModule,
GlobalAttentionModule).  Channels-last layout; the softmax over the K
neighbor slots is count-masked exactly as attention.py:84-90.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.neighbors import count_to_mask
from .common import PartialGroupNorm


class AttentionPool(nn.Module):
    """Per-neighborhood attention pooling (AttentionModule, attention.py:35-96).

    query:   feat             (B, M, Cq)      — feature at the center point
    key:     grouped_feat     (B, M, K, Ck)   — raw grouped features
    value:   grouped_feat_out (B, M, K, Cout) — MLP output
    counts:  (B, M) int or 'all'

    Scores are an MLP over [conv(query) broadcast, conv(key)]; softmax over K
    with invalid slots masked to -1e9; output is the weighted value sum.
    """

    out_features: int
    attention_bn: bool = True
    transform_grouped_feat_out: bool = True
    last_activation: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, feat, grouped_feat, grouped_feat_out, counts):
        K = grouped_feat.shape[-2]
        c_out = self.out_features
        c1 = max(feat.shape[-1], 32)
        c2 = max(grouped_feat.shape[-1], 32)
        inter_c = min(c1 + c2, c_out)

        q = nn.Dense(c1, dtype=self.dtype)(feat)[:, :, None, :]  # (B, M, 1, C1)
        q = jnp.broadcast_to(q, q.shape[:2] + (K, c1))
        k = nn.Dense(c2, dtype=self.dtype)(grouped_feat)  # (B, M, K, C2)
        total = jnp.concatenate([q, k], axis=-1)

        h = jnp.maximum(total, 0.0)  # ReLU precedes the norm (attention.py:46-57)
        if self.attention_bn:
            h = PartialGroupNorm(min(32, c1 + c2))(h)
        h = nn.Dense(inter_c, dtype=self.dtype)(h)
        h = jnp.maximum(h, 0.0)
        if self.attention_bn:
            h = PartialGroupNorm(min(32, inter_c))(h)
        scores = nn.Dense(c_out, dtype=self.dtype)(h)  # (B, M, K, C_out)

        if not (isinstance(counts, str) and counts == "all"):
            c = jnp.maximum(counts, 1)
            mask = count_to_mask(c, K)[..., None].astype(scores.dtype)  # (B,M,K,1)
            scores = scores * mask + (-1e9) * (1.0 - mask)
        weight = nn.softmax(scores.astype(jnp.float32), axis=-2)  # softmax over K, f32

        v = grouped_feat_out
        if self.transform_grouped_feat_out:
            v = nn.Dense(c_out, dtype=self.dtype)(v)
            if self.last_activation:
                if self.attention_bn:
                    v = PartialGroupNorm(min(32, c_out))(v)
                v = jnp.maximum(v, 0.0)
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
