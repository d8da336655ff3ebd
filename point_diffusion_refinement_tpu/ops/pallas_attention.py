"""Fused AttentionPool (score + masked softmax + weighted value sum) as
Pallas TPU kernels.

The denoiser runs ~13 AttentionPool instances per reverse step
(AttentionModule, pointnet2_ops/attention.py:35-96); profiled on v5e they
are the single largest model component (~1.4 ms of a ~5.2 ms step at B=4):
every stage writes a (B, M, K, C) intermediate to HBM and every elementwise
pass runs at C<=64 of 128 lanes.

This module chains THREE grid sweeps over (B, M-tiles), keeping all
(MT*K, C) intermediates in VMEM and writing only the (B, M, c_out) result:

  P1  k = relu(grouped @ W1 + b1) and v = gfo @ W4 + b4 — accumulate their
      per-channel f32 sums/sum-squares (the GroupNorm statistics need the
      full M extent, so they are the only values that must cross tiles);
  --  (XLA glue: the cheap (B, M, .) q path, and the GroupNorm mul/add
      vectors from the gathered statistics — exact _SplitConcatGroupNorm /
      PartialGroupNorm math, models/attention.py:35-100, common.py:44-118)
  P2  recompute k, normalize, kp = @W2k + b2, h = relu(qp + kp) —
      accumulate h's statistics for the second GroupNorm;
  P3  recompute h, normalize, scores = @W3 + b3, count-mask, f32 softmax
      over K, v-path normalize + relu, weighted sum -> out.

Recomputing k/h costs two extra tiny MXU matmuls per tile; the win is that
no (B, M, K, C) tensor ever round-trips HBM.  Value semantics match the
XLA AttentionPool bit-for-bit up to f32 reduction order (bf16 compute
dtype, f32 statistics, bf16 affine forms copied from PartialGroupNorm /
_SplitConcatGroupNorm); verified in tests/test_pallas_attention.py.

Inference-only (no VJP), like the windowed grouping kernels — training
keeps the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_tile(M: int, K: int) -> int:
    """Query-row tile: keep MT*K rows <= 2048 so the per-tile working set
    (several (MT*K, 128) planes) stays well inside VMEM."""
    mt = max(8, min(128, 2048 // K))
    while M % mt:
        mt //= 2
    return max(mt, 1)


def _dense(x, w, b):
    """nn.Dense(dtype=bfloat16) semantics: bf16 operands, f32 MXU
    accumulation rounded to bf16, bf16 bias add.  Contracts x's last dim."""
    y = jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    return y if b is None else y + b


def _expand_rows(x, K):
    """(MT, C) -> (MT*K, C) with out[r] = x[r // K], as a one-hot MXU
    matmul — Mosaic's gather lowering cannot expand rows, so the broadcast
    rides the MXU instead (exact for bf16 payloads, f32 accumulation of
    single products)."""
    MT = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (MT * K, MT), 0) // K
    cols = jax.lax.broadcasted_iota(jnp.int32, (MT * K, MT), 1)
    e = jnp.where(rows == cols, 1.0, 0.0).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        e, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _stats_kernel(K, g_ref, gfo_ref, w1_ref, b1_ref, w4_ref, b4_ref,
                  kst_ref, vst_ref):
    """P1: accumulate per-channel f32 sums / sum-squares of
    k = relu(grouped @ W1 + b1) and v = gfo @ W4 + b4."""
    t = pl.program_id(1)

    kd = jnp.maximum(_dense(g_ref[0], w1_ref[:], b1_ref[:]), 0)  # (MT*K, C2)
    vd = _dense(gfo_ref[0], w4_ref[:], b4_ref[:])                # (MT*K, Cv)

    kf = kd.astype(jnp.float32)
    vf = vd.astype(jnp.float32)
    # keepdims + concat: stays 2D throughout (1D vectors are fragile in
    # Mosaic lowering)
    ks = jnp.concatenate(
        [jnp.sum(kf, 0, keepdims=True), jnp.sum(kf * kf, 0, keepdims=True)], 0
    )  # (2, C2)
    vs = jnp.concatenate(
        [jnp.sum(vf, 0, keepdims=True), jnp.sum(vf * vf, 0, keepdims=True)], 0
    )

    @pl.when(t == 0)
    def _():
        kst_ref[0] = ks
        vst_ref[0] = vs

    @pl.when(t != 0)
    def _():
        kst_ref[0] = kst_ref[0] + ks
        vst_ref[0] = vst_ref[0] + vs


def _h_stats_kernel(K, g_ref, qp_ref, mulk_ref, addk_ref, w1_ref, b1_ref,
                    w2k_ref, b2_ref, hst_ref):
    """P2: h = relu(qp + (kn @ W2k + b2)) — accumulate h's GN statistics."""
    t = pl.program_id(1)
    MT = qp_ref.shape[1]
    I = qp_ref.shape[2]

    kd = jnp.maximum(_dense(g_ref[0], w1_ref[:], b1_ref[:]), 0)
    # GN0 k-half: f32 affine then bf16 (the _SplitConcatGroupNorm form)
    kn = (kd.astype(jnp.float32) * mulk_ref[0]
          + addk_ref[0]).astype(jnp.bfloat16)
    kp = _dense(kn, w2k_ref[:], b2_ref[:])                  # (MT*K, I)
    qp = _expand_rows(qp_ref[0], K).astype(jnp.bfloat16)    # (MT*K, I)
    h = jnp.maximum(qp + kp, 0)                             # bf16
    hf = h.astype(jnp.float32)
    hs = jnp.concatenate(
        [jnp.sum(hf, 0, keepdims=True), jnp.sum(hf * hf, 0, keepdims=True)], 0
    )  # (2, I)

    @pl.when(t == 0)
    def _():
        hst_ref[0] = hs

    @pl.when(t != 0)
    def _():
        hst_ref[0] = hst_ref[0] + hs


def _out_kernel(K, has_mask, g_ref, gfo_ref, qp_ref, mulk_ref,
                addk_ref, mu1_ref, s1_ref, bb1_ref, mu2_ref, s2_ref, bb2_ref,
                w1_ref, b1_ref, w2k_ref, b2_ref, w3_ref, b3_ref, w4_ref,
                b4_ref, out_ref):
    """P3: recompute h, normalize (bf16 PartialGroupNorm affine), scores,
    count-mask, f32 softmax over K, v-path normalize+relu, weighted sum.
    The neighbor counts ride as one extra bf16 lane of the qp operand
    (counts <= K are exact in bf16) — a separate (B, M) i32 operand has no
    legal real-TPU block shape at MT < 128."""
    MT = qp_ref.shape[1]
    I = qp_ref.shape[2] - 1
    c_out = out_ref.shape[2]

    kd = jnp.maximum(_dense(g_ref[0], w1_ref[:], b1_ref[:]), 0)
    kn = (kd.astype(jnp.float32) * mulk_ref[0]
          + addk_ref[0]).astype(jnp.bfloat16)
    kp = _dense(kn, w2k_ref[:], b2_ref[:])
    qpx = _expand_rows(qp_ref[0], K)                        # f32 (MT*K, I+1)
    qp = qpx[:, :I].astype(jnp.bfloat16)
    h = jnp.maximum(qp + kp, 0)
    # PartialGroupNorm bf16 form: (x - mu) * s + b, all bf16 (common.py:108-116)
    hn = (h - mu1_ref[0].astype(jnp.bfloat16)) \
        * s1_ref[0].astype(jnp.bfloat16) \
        + bb1_ref[0].astype(jnp.bfloat16)
    scores = _dense(hn, w3_ref[:], b3_ref[:])               # (MT*K, c_out)

    if has_mask:
        cnt_rows = jnp.maximum(qpx[:, I:I + 1], 1.0)        # f32 (MT*K, 1)
        k_rows = (
            jax.lax.broadcasted_iota(jnp.int32, (MT * K, 1), 0) % K
        ).astype(jnp.float32)
        scores = jnp.where(
            k_rows < cnt_rows, scores, jnp.asarray(-1e9, jnp.bfloat16)
        )

    s3 = scores.astype(jnp.float32).reshape(MT, K, c_out)
    smax = jnp.max(s3, axis=1, keepdims=True)
    e = jnp.exp(s3 - smax)
    weight = e / jnp.sum(e, axis=1, keepdims=True)          # (MT, K, c_out) f32

    vd = _dense(gfo_ref[0], w4_ref[:], b4_ref[:])
    vn = (vd - mu2_ref[0].astype(jnp.bfloat16)) \
        * s2_ref[0].astype(jnp.bfloat16) \
        + bb2_ref[0].astype(jnp.bfloat16)
    vn = jnp.maximum(vn, 0)
    v3 = vn.astype(jnp.float32).reshape(MT, K, c_out)
    out_ref[0] = jnp.sum(v3 * weight, axis=1)               # (MT, c_out) f32


def _group_mul_add(sum_c, ssq_c, scale, bias, cnt, num_groups):
    """flax GroupNorm statistics -> per-channel (mul, add) f32 vectors:
    y = x * mul + add == (x - mean) * rsqrt(var + 1e-5) * scale + bias.
    Matches PartialGroupNorm / _SplitConcatGroupNorm (fast variance,
    eps 1e-5, f32)."""
    B, normed_c = sum_c.shape
    gs = normed_c // num_groups
    mean = sum_c.reshape(B, num_groups, gs).sum(-1) / cnt
    var = jnp.maximum(
        ssq_c.reshape(B, num_groups, gs).sum(-1) / cnt - mean * mean, 0.0
    )
    rstd = jax.lax.rsqrt(var + 1e-5)
    mul = jnp.repeat(rstd, gs, axis=-1) * scale[None]
    add = bias[None] - jnp.repeat(mean, gs, axis=-1) * mul
    return mul, add


def _pgn_mu_s_b(sum_c, ssq_c, scale, bias, cnt, num_groups, c):
    """PartialGroupNorm's (mu, s, b) f32 vectors with identity lanes over the
    passthrough tail (common.py:96-106): y = (x - mu) * s + b."""
    B, normed_c = sum_c.shape
    gs = normed_c // num_groups
    mean = sum_c.reshape(B, num_groups, gs).sum(-1) / cnt
    var = jnp.maximum(
        ssq_c.reshape(B, num_groups, gs).sum(-1) / cnt - mean * mean, 0.0
    )
    inv = jax.lax.rsqrt(var + 1e-5)
    to_c = lambda a: jnp.broadcast_to(
        a[:, :, None], (B, num_groups, gs)
    ).reshape(B, normed_c)
    mu = to_c(mean)
    s = to_c(inv) * scale[None]
    b = jnp.broadcast_to(bias[None], (B, normed_c))
    if normed_c != c:
        pad = c - normed_c
        mu = jnp.concatenate([mu, jnp.zeros((B, pad), jnp.float32)], 1)
        s = jnp.concatenate([s, jnp.ones((B, pad), jnp.float32)], 1)
        b = jnp.concatenate([b, jnp.zeros((B, pad), jnp.float32)], 1)
    return mu, s, b


@functools.partial(
    jax.jit,
    static_argnames=(
        "c1", "c2", "inter_c", "c_out", "K", "interpret",
    ),
)
def fused_attention_pool(
    feat: jax.Array,            # (B, M, Cq) — feature at the center points
    grouped: jax.Array,         # (B, M, K, Ck) raw grouped features
    gfo: jax.Array,             # (B, M, K, Cv) MLP output (values)
    counts: Optional[jax.Array],  # (B, M) i32, or None for 'all'
    w0, b0, w1, b1,             # Dense_0 (q), Dense_1 (k)
    gn0_scale, gn0_bias,        # _SplitConcatGroupNorm params (normed0,)
    w2, b2,                     # _SplitDense (c1+c2, inter_c)
    gn1_scale, gn1_bias,        # PartialGroupNorm_1 (normed1,)
    w3, b3,                     # Dense_3 (scores)
    w4, b4,                     # Dense_4 (values)
    gn2_scale, gn2_bias,        # PartialGroupNorm_2 (normed2,)
    *,
    c1: int, c2: int, inter_c: int, c_out: int, K: int,
    interpret: bool = False,
) -> jax.Array:
    """Value-equivalent fused AttentionPool forward (all flags true:
    attention_bn, transform_grouped_feat_out, last_activation).

    Returns (B, M, c_out) f32 — the same dtype/value the XLA path's final
    `jnp.sum(v * weight, axis=-2)` produces under bf16 compute.
    """
    B, M, _, Ck = grouped.shape
    Cv = gfo.shape[-1]
    MT = _row_tile(M, K)
    T = M // MT
    bf = jnp.bfloat16
    g2 = grouped.astype(bf).reshape(B, M * K, Ck)
    gfo2 = gfo.astype(bf).reshape(B, M * K, Cv)
    w0b, w1b, w4b = w0.astype(bf), w1.astype(bf), w4.astype(bf)
    # biases as (1, C): 2D VMEM operands broadcast in the row add and avoid
    # 1D-operand lowering fragility on real TPU
    b0b = b0.astype(bf)
    b1b, b4b = b1.astype(bf)[None], b4.astype(bf)[None]
    w2qb = w2[:c1].astype(bf)
    w2kb = w2[c1:].astype(bf)
    b2b = b2.astype(bf)[None]
    w3b, b3b = w3.astype(bf), b3.astype(bf)[None]

    ng0 = min(32, c1 + c2)
    normed0 = (c1 + c2) - (c1 + c2) % ng0
    ng1 = min(32, inter_c)
    normed1 = inter_c - inter_c % ng1
    ng2 = min(32, c_out)
    normed2 = c_out - c_out % ng2

    grid = (B, T)
    rows_spec = lambda C: pl.BlockSpec((1, MT * K, C), lambda b, t: (b, t, 0),
                                       memory_space=pltpu.VMEM)
    # per-batch vectors ride as (B, 1, C) with (1, 1, C) blocks: real-TPU
    # lowering requires the last two block dims be (8,128)-divisible or
    # equal to the array dims
    vec_spec = lambda C: pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                                      memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    stat_spec = lambda C: pl.BlockSpec((1, 2, C), lambda b, t: (b, 0, 0),
                                       memory_space=pltpu.VMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20)

    # ---- P1: k / v statistics -------------------------------------------
    kst, vst = pl.pallas_call(
        functools.partial(_stats_kernel, K),
        grid=grid,
        in_specs=[rows_spec(Ck), rows_spec(Cv), full, full, full, full],
        out_specs=[stat_spec(c2), stat_spec(c_out)],
        out_shape=[
            jax.ShapeDtypeStruct((B, 2, c2), jnp.float32),
            jax.ShapeDtypeStruct((B, 2, c_out), jnp.float32),
        ],
        compiler_params=params,
        interpret=interpret,
    )(g2, gfo2, w1b, b1b, w4b, b4b)

    # ---- XLA glue: q path + GroupNorm vectors ---------------------------
    qd = jnp.maximum(_dense(feat.astype(bf), w0b, b0b), 0)  # (B, M, c1)
    qf = qd.astype(jnp.float32)
    q_sum = jnp.sum(qf, axis=1) * float(K)                  # (B, c1)
    q_ssq = jnp.sum(qf * qf, axis=1) * float(K)

    # GN0: joint q/k statistics (q weighted by K), channels [:normed0]
    sum_c = jnp.concatenate([q_sum, kst[:, 0]], axis=-1)[:, :normed0]
    ssq_c = jnp.concatenate([q_ssq, kst[:, 1]], axis=-1)[:, :normed0]
    cnt0 = float(M) * float(K) * (normed0 // ng0)
    mul0, add0 = _group_mul_add(sum_c, ssq_c, gn0_scale, gn0_bias, cnt0, ng0)
    nq = min(c1, normed0)
    mul_q = jnp.concatenate(
        [mul0[:, :nq], jnp.ones((B, c1 - nq), jnp.float32)], -1)
    add_q = jnp.concatenate(
        [add0[:, :nq], jnp.zeros((B, c1 - nq), jnp.float32)], -1)
    nk = normed0 - nq
    mul_k = jnp.concatenate(
        [mul0[:, nq:], jnp.ones((B, c2 - nk), jnp.float32)], -1)
    add_k = jnp.concatenate(
        [add0[:, nq:], jnp.zeros((B, c2 - nk), jnp.float32)], -1)

    qn = (qf * mul_q[:, None, :] + add_q[:, None, :]).astype(bf)
    qp = jax.lax.dot_general(
        qn, w2qb, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(bf)                                            # (B, M, I), no bias

    cntv = float(M) * float(K) * (normed2 // ng2) if normed2 else 1.0
    if normed2:
        mu2, s2, bb2 = _pgn_mu_s_b(
            vst[:, 0, :normed2], vst[:, 1, :normed2], gn2_scale, gn2_bias,
            cntv, ng2, c_out,
        )
    else:
        mu2 = jnp.zeros((B, c_out), jnp.float32)
        s2 = jnp.ones((B, c_out), jnp.float32)
        bb2 = jnp.zeros((B, c_out), jnp.float32)

    # ---- P2: h statistics ------------------------------------------------
    qp_spec = pl.BlockSpec((1, MT, inter_c), lambda b, t: (b, t, 0),
                           memory_space=pltpu.VMEM)
    (hst,) = pl.pallas_call(
        functools.partial(_h_stats_kernel, K),
        grid=grid,
        in_specs=[rows_spec(Ck), qp_spec, vec_spec(c2), vec_spec(c2),
                  full, full, full, full],
        out_specs=[stat_spec(inter_c)],
        out_shape=[jax.ShapeDtypeStruct((B, 2, inter_c), jnp.float32)],
        compiler_params=params,
        interpret=interpret,
    )(g2, qp, mul_k[:, None], add_k[:, None], w1b, b1b, w2kb, b2b)

    if normed1:
        cnt1 = float(M) * float(K) * (normed1 // ng1)
        mu1, s1, bb1 = _pgn_mu_s_b(
            hst[:, 0, :normed1], hst[:, 1, :normed1], gn1_scale, gn1_bias,
            cnt1, ng1, inter_c,
        )
    else:
        mu1 = jnp.zeros((B, inter_c), jnp.float32)
        s1 = jnp.ones((B, inter_c), jnp.float32)
        bb1 = jnp.zeros((B, inter_c), jnp.float32)

    # ---- P3: masked softmax + weighted sum --------------------------------
    has_mask = counts is not None
    cnt_in = counts if has_mask else jnp.full((B, M), K, jnp.int32)
    # counts ride as one extra bf16 lane of qp (exact for counts <= K)
    qp_c = jnp.concatenate(
        [qp, jnp.clip(cnt_in, 0, K).astype(jnp.bfloat16)[..., None]], axis=-1
    )
    qp_c_spec = pl.BlockSpec((1, MT, inter_c + 1), lambda b, t: (b, t, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_out_kernel, K, has_mask),
        grid=grid,
        in_specs=[
            rows_spec(Ck), rows_spec(Cv), qp_c_spec,
            vec_spec(c2), vec_spec(c2),
            vec_spec(inter_c), vec_spec(inter_c), vec_spec(inter_c),
            vec_spec(c_out), vec_spec(c_out), vec_spec(c_out),
            full, full, full, full, full, full, full, full,
        ],
        out_specs=pl.BlockSpec((1, MT, c_out), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, c_out), jnp.float32),
        compiler_params=params,
        interpret=interpret,
    )(g2, gfo2, qp_c, mul_k[:, None], add_k[:, None],
      mu1[:, None], s1[:, None], bb1[:, None],
      mu2[:, None], s2[:, None], bb2[:, None],
      w1b, b1b, w2kb, b2b, w3b, b3b, w4b, b4b)
    return out
