"""On-chip probe: packed-K AttentionPool vs the shipped XLA path.

Hypothesis: the (B, M, K, C) attention chains at C=32-44 waste lanes
(C pads to 128) in both HBM layout and MXU tiles.  Folding G = 128//C
neighbor slots into the lane axis — block-diagonal weights, per-channel-sum
GroupNorm stats, two-stage softmax reductions — makes every big-tensor pass
lane-dense and cuts block-diag MACs ~(128*128)/(G*C*F) per matmul.

Measures both variants inside a 50-iteration scan (STATUS.md: standalone
microbenches through the tunnel are garbage; in-scan timing is the signal)
and checks value parity (bf16 envelope) against each other.

Usage: python tools/probe_packed_attention.py [M] [K] [CK] [CQ] [COUT] [G]
Defaults = dec_map_0: M=2048 K=32 CK=41 CQ=128 COUT=32 G=4.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from point_diffusion_refinement_tpu.models.attention import AttentionPool
from point_diffusion_refinement_tpu.ops.neighbors import count_to_mask

B = 4
DT = jnp.bfloat16


def block_diag(W, G):
    """(C, F) -> (G*C, G*F) block-diagonal."""
    C, F = W.shape
    out = jnp.zeros((G, C, G, F), W.dtype)
    idx = jnp.arange(G)
    out = out.at[idx, :, idx, :].set(jnp.broadcast_to(W, (G, C, F)))
    return out.reshape(G * C, G * F)


def packed_attention(p, feat, kP, vP, counts, *, G, K, c1, c2, inter_c, c_out):
    """Value-equivalent (mod f32 reassociation) to AttentionPool's unfused
    path, with the k-side tensors packed as (B, M, K//G, G*C)."""
    Kg = K // G
    M = feat.shape[1]
    Ck = kP.shape[-1] // G
    Cv = vP.shape[-1] // G

    def d(name):
        return p[name]["kernel"].astype(DT), p[name]["bias"].astype(DT)

    w0, b0 = d("Dense_0")
    w1, b1 = d("Dense_1")
    w2, b2 = d("Dense_2")
    w3, b3 = d("Dense_3")
    w4, b4 = d("Dense_4")
    gn0 = p["PartialGroupNorm_0"]["GroupNorm_0"]
    gn1 = p["PartialGroupNorm_1"]["GroupNorm_0"]
    gn2 = p["PartialGroupNorm_2"]["GroupNorm_0"]

    tile = lambda v: jnp.tile(v, G)

    # Dense_0 / Dense_1
    q = feat @ w0 + b0                                    # (B, M, c1)
    k = kP @ block_diag(w1, G) + tile(b1)                 # (B, M, Kg, G*c2)
    hq = jnp.maximum(q, 0)
    hk = jnp.maximum(k, 0)

    # _SplitConcatGroupNorm over concat([q, k]) channels (q weighted by K)
    c = c1 + c2
    ng = min(32, c)
    normed_c = c - c % ng
    gs = normed_c // ng
    cnt = float(M) * float(K) * gs
    xq = hq.astype(jnp.float32)
    xk = hk.astype(jnp.float32)
    sum_k = jnp.sum(xk, axis=(1, 2)).reshape(B, G, c2).sum(1)   # (B, c2)
    ssq_k = jnp.sum(xk * xk, axis=(1, 2)).reshape(B, G, c2).sum(1)
    sum_c = jnp.concatenate([jnp.sum(xq, 1) * K, sum_k], -1)[:, :normed_c]
    ssq_c = jnp.concatenate([jnp.sum(xq * xq, 1) * K, ssq_k], -1)[:, :normed_c]
    mean = sum_c.reshape(B, ng, gs).sum(-1) / cnt
    var = jnp.maximum(ssq_c.reshape(B, ng, gs).sum(-1) / cnt - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + 1e-5)
    mul = jnp.repeat(rstd, gs, -1) * gn0["scale"][None]
    add = gn0["bias"][None] - jnp.repeat(mean, gs, -1) * mul
    nq = min(c1, normed_c)
    hq = (xq[..., :nq] * mul[:, None, :nq] + add[:, None, :nq]).astype(DT)
    nk = normed_c - nq
    # identity lanes over the passthrough k tail (nk < c2), then tile G
    mul_kc = jnp.concatenate(
        [mul[:, nq:], jnp.ones((B, c2 - nk), mul.dtype)], -1
    )
    add_kc = jnp.concatenate(
        [add[:, nq:], jnp.zeros((B, c2 - nk), add.dtype)], -1
    )
    mul_k = jnp.tile(mul_kc, (1, G)).astype(DT)          # (B, G*c2)
    add_k = jnp.tile(add_kc, (1, G)).astype(DT)
    hk = (hk * mul_k[:, None, None, :] + add_k[:, None, None, :]).astype(DT)

    # _SplitDense at the q/k boundary
    qp = hq @ w2[:c1]                                     # (B, M, inter_c)
    kp = hk @ block_diag(w2[c1:], G) + tile(b2)           # (B, M, Kg, G*ic)
    h = jnp.maximum(jnp.tile(qp, (1, 1, G))[:, :, None, :] + kp, 0)

    # PartialGroupNorm_1 over (M, K) spatial
    ngi = min(32, inter_c)
    normed_i = inter_c - inter_c % ngi
    gsi = normed_i // ngi
    cnti = float(M) * float(K) * gsi
    hf = h.astype(jnp.float32)
    sum_i = jnp.sum(hf, (1, 2)).reshape(B, G, inter_c).sum(1)[:, :normed_i]
    ssq_i = jnp.sum(hf * hf, (1, 2)).reshape(B, G, inter_c).sum(1)[:, :normed_i]
    mean_i = sum_i.reshape(B, ngi, gsi).sum(-1) / cnti
    var_i = jnp.maximum(
        ssq_i.reshape(B, ngi, gsi).sum(-1) / cnti - mean_i * mean_i, 0.0
    )
    rstd_i = jax.lax.rsqrt(var_i + 1e-5)
    mul_i = jnp.repeat(rstd_i, gsi, -1) * gn1["scale"][None]
    add_i = gn1["bias"][None] - jnp.repeat(mean_i, gsi, -1) * mul_i
    if normed_i < inter_c:
        pad = inter_c - normed_i
        mul_i = jnp.concatenate([mul_i, jnp.ones((B, pad))], -1)
        add_i = jnp.concatenate([add_i, jnp.zeros((B, pad))], -1)
    h = (h * jnp.tile(mul_i, (1, G)).astype(DT)[:, None, None, :]
         + jnp.tile(add_i, (1, G)).astype(DT)[:, None, None, :])

    scores = h @ block_diag(w3, G) + tile(b3)             # (B, M, Kg, G*c_out)

    # count mask, packed slot order k = kg*G + g
    mask = count_to_mask(jnp.maximum(counts, 1), K).reshape(B, M, Kg, G)
    maskc = jnp.repeat(mask, c_out, -1).astype(scores.dtype)
    scores = scores * maskc + (-1e9) * (1.0 - maskc)

    # two-stage softmax over K (Kg axis + G lane groups)
    s32 = scores.astype(jnp.float32)
    mx = jnp.max(s32, 2).reshape(B, M, G, c_out).max(2)   # (B, M, c_out)
    e = jnp.exp(s32 - jnp.tile(mx, (1, 1, G))[:, :, None, :])
    den = jnp.sum(e, 2).reshape(B, M, G, c_out).sum(2)
    w = e / jnp.tile(den, (1, 1, G))[:, :, None, :]

    # value path
    v = vP @ block_diag(w4, G) + tile(b4)                 # (B, M, Kg, G*c_out)
    ngo = min(32, c_out)
    normed_o = c_out - c_out % ngo
    gso = normed_o // ngo
    cnto = float(M) * float(K) * gso
    vf = v.astype(jnp.float32)
    sum_o = jnp.sum(vf, (1, 2)).reshape(B, G, c_out).sum(1)[:, :normed_o]
    ssq_o = jnp.sum(vf * vf, (1, 2)).reshape(B, G, c_out).sum(1)[:, :normed_o]
    mean_o = sum_o.reshape(B, ngo, gso).sum(-1) / cnto
    var_o = jnp.maximum(
        ssq_o.reshape(B, ngo, gso).sum(-1) / cnto - mean_o * mean_o, 0.0
    )
    rstd_o = jax.lax.rsqrt(var_o + 1e-5)
    mul_o = jnp.repeat(rstd_o, gso, -1) * gn2["scale"][None]
    add_o = gn2["bias"][None] - jnp.repeat(mean_o, gso, -1) * mul_o
    v = (v * jnp.tile(mul_o, (1, G)).astype(DT)[:, None, None, :]
         + jnp.tile(add_o, (1, G)).astype(DT)[:, None, None, :])
    v = jnp.maximum(v, 0)

    out = jnp.sum(v.astype(jnp.float32) * w, 2)           # (B, M, G*c_out)
    return out.reshape(B, M, G, c_out).sum(2)


def main():
    a = sys.argv[1:]
    M = int(a[0]) if len(a) > 0 else 2048
    K = int(a[1]) if len(a) > 1 else 32
    CK = int(a[2]) if len(a) > 2 else 41
    CQ = int(a[3]) if len(a) > 3 else 128
    COUT = int(a[4]) if len(a) > 4 else 32
    G = int(a[5]) if len(a) > 5 else 4
    STEPS = 50

    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((B, M, CQ)), DT)
    grouped = jnp.asarray(rng.standard_normal((B, M, K, CK)), DT)
    vout = jnp.asarray(rng.standard_normal((B, M, K, COUT)), DT)
    counts = jnp.asarray(rng.integers(1, K + 1, (B, M)), jnp.int32)

    mod = AttentionPool(COUT, dtype=DT)
    params = jax.jit(mod.init)(jax.random.key(0), feat, grouped, vout, counts)
    p = params["params"]

    c1 = max(CQ, 32)
    c2 = max(CK, 32)
    inter_c = min(c1 + c2, COUT)
    if CK < 32:
        raise SystemExit("probe assumes CK >= 32 (c2 == CK)")

    base = jax.jit(lambda f, g, v, c: mod.apply(params, f, g, v, c))
    packed = jax.jit(
        functools.partial(
            packed_attention, p, G=G, K=K, c1=c1, c2=c2,
            inter_c=inter_c, c_out=COUT,
        )
    )

    o1 = base(feat, grouped, vout, counts)
    kP = grouped.reshape(B, M, K // G, G * CK)
    vP = vout.reshape(B, M, K // G, G * COUT)
    o2 = packed(feat, kP, vP, counts)
    err = jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)))
    scale = jnp.max(jnp.abs(o1).astype(jnp.float32)) + 1e-8
    print(f"parity: max abs err {float(err):.4e}  rel {float(err/scale):.4e}")

    def scan_time(fn, pack):
        @jax.jit
        def run(f, g, v, c):
            def body(carry, _):
                gg = g + carry * jnp.asarray(1e-3, DT)
                if pack:
                    gg = gg.reshape(B, M, K // G, G * CK)
                    vv = v.reshape(B, M, K // G, G * COUT)
                else:
                    vv = v
                o = fn(f, gg, vv, c)
                return jnp.mean(o).astype(DT), o
            return jax.lax.scan(body, jnp.asarray(0.0, DT), None, length=STEPS)

        out = run(feat, grouped, vout, counts)
        jax.block_until_ready(out)
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            out = run(feat + i * 1e-4, grouped, vout, counts)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return min(ts) / STEPS * 1e6

    t_base = scan_time(lambda f, g, v, c: mod.apply(params, f, g, v, c), False)
    t_pack = scan_time(
        lambda f, g, v, c: packed_attention(
            p, f, g, v, c, G=G, K=K, c1=c1, c2=c2, inter_c=inter_c, c_out=COUT
        ),
        True,
    )
    print(f"M={M} K={K} CK={CK} CQ={CQ} COUT={COUT} G={G}")
    print(f"baseline: {t_base:8.1f} us/iter")
    print(f"packed:   {t_pack:8.1f} us/iter   speedup x{t_base/t_pack:.2f}")


if __name__ == "__main__":
    main()
