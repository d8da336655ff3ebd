"""Whole-chain Pallas kernel for the grouped ConditionedMLP stack.

The denoiser's per-level MLPs (Mlp_plus_t_emb, reference
pointnet2_modules.py:69-174) run Dense -> GroupNorm -> relu layers over
grouped (B, M, K, C) tensors.  XLA executes each layer as 3-4 separate
HBM-bound fusions (matmul, stats reduce, normalize+act) because GroupNorm's
per-(sample, group) statistics split every layer into a reduce and a
broadcast pass; at B=4, M=2048, K=32 that is ~15 round trips of 10-40 MB
activations per module call, and the tail of those fusions dominates the
6 ms sampling step (profiled on v5e).

GroupNorm statistics are per SAMPLE, so one grid step per batch row can
hold the ENTIRE chain in VMEM: the (M*K, C) activations are 4-8 MB, the
weights a few hundred KB.  This kernel executes the whole stack —
first_conv, every Dense/GN/act layer, the t/condition embedding adds, and
the residual — with a single HBM read of the grouped input and a single
write of the output.

The op sequence is data (built by the module from its config), so both
layer orders (bn_first True/False), trim_last, missing injections, and the
residual variants all map onto one kernel builder:

    ("dense", widx, bidx)      h = h @ W[widx] [+ W[bidx]]  (bf16, f32 acc)
    ("gn", sidx, bidx, g, nc)  GroupNorm over first nc channels
    ("relu",)                  max(h, 0)
    ("addvec", vidx)           h += vec[vidx][None, :]    (B, C) operand
    ("save",)                  stash h (residual source)
    ("res", widx | None, bidx) h += saved [@ W[widx] [+ W[bidx]]]

Numerics match the module path under bfloat16 compute: bf16 matmuls with
f32 accumulation, f32 stats, bf16 affine/activation.  Inference-only (no
VJP), like the windowed grouping kernels in ops/pallas_window.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_rows(h, scale, bias, groups: int, normed_c: int):
    """GroupNorm over rows of (N, C): per-group stats from per-channel
    sums, bf16 affine, trailing C - normed_c channels untouched.

    The channel->group combine and group->channel broadcast run as tiny
    matmuls against a one-hot group-selector matrix — Mosaic rejects the
    (C,) -> (g, cg) shape cast a reshape-based combine would need."""
    n, c = h.shape
    cg = normed_c // groups
    hf = h[:, :normed_c].astype(jnp.float32)
    s1 = jnp.sum(hf, axis=0, keepdims=True)      # (1, normed_c)
    s2 = jnp.sum(hf * hf, axis=0, keepdims=True)
    cnt = jnp.float32(n * cg)
    ci = jax.lax.broadcasted_iota(jnp.int32, (normed_c, groups), 0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (normed_c, groups), 1)
    G = jnp.where(ci // cg == gi, 1.0, 0.0)      # (normed_c, groups)
    dot = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    mean = dot(s1, G) / cnt                      # (1, groups)
    var = jnp.maximum(dot(s2, G) / cnt - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + 1e-5)
    GT = jnp.transpose(G)                        # (groups, normed_c)
    s = dot(inv, GT) * scale[None, :]            # (1, normed_c)
    b = bias[None, :] - dot(mean * inv, GT) * scale[None, :]
    if normed_c != c:
        s = jnp.concatenate(
            [s, jnp.ones((1, c - normed_c), jnp.float32)], axis=1
        )
        b = jnp.concatenate(
            [b, jnp.zeros((1, c - normed_c), jnp.float32)], axis=1
        )
    return h * s.astype(h.dtype) + b.astype(h.dtype)


def _chain_kernel(spec, n_w, n_v, *refs):
    """Grid (B,).  refs = (x_ref, *w_refs, *v_refs, out_ref)."""
    x_ref = refs[0]
    w = refs[1:1 + n_w]
    v = refs[1 + n_w:1 + n_w + n_v]
    out_ref = refs[-1]
    h = x_ref[0]                                   # (MK, C_in) bf16
    saved = None
    for op in spec:
        kind = op[0]
        if kind == "dense":
            h = jax.lax.dot_general(
                h, w[op[1]][0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(h.dtype)
            if op[2] is not None:
                h = h + w[op[2]][0, 0][None, :].astype(h.dtype)
        elif kind == "gn":
            h = _gn_rows(h, w[op[1]][0, 0], w[op[2]][0, 0], op[3], op[4])
        elif kind == "relu":
            h = jnp.maximum(h, 0)
        elif kind == "addvec":
            h = h + v[op[1]][0, 0][None, :].astype(h.dtype)
        elif kind == "save":
            saved = h
        elif kind == "res":
            if op[1] is None:
                h = h + saved
            else:
                r = jax.lax.dot_general(
                    saved, w[op[1]][0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(h.dtype)
                if op[2] is not None:
                    r = r + w[op[2]][0, 0][None, :].astype(h.dtype)
                h = h + r
        else:  # pragma: no cover - spec is built by trusted module code
            raise ValueError(kind)
    out_ref[0] = h


def _chain_call(x, weights, vectors, spec: tuple, interpret: bool = False):
    """x: (B, MK, C_in) bf16.  weights: tuple of (Ci, Co) bf16 matrices and
    (C,) f32 gn params (reshaped to (1, 1, C) lanes).  vectors: tuple of
    (B, C) f32/bf16 per-sample injection rows.

    No inner jax.jit: the call always runs inside the sampler's outer jit,
    and a nested closed_call with static-arg specs trips an XLA lowering-
    cache KeyError when several distinct specs appear in one program."""
    B, MK, C_in = x.shape
    c_out = C_in
    for op in spec:
        if op[0] == "dense":
            c_out = weights[op[1]].shape[-1]
    kernel = functools.partial(_chain_kernel, spec, len(weights), len(vectors))
    in_specs = [
        pl.BlockSpec((1, MK, C_in), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    w_ops = []
    for wt in weights:
        if wt.ndim == 2:
            w_ops.append(wt[None])                 # (1, Ci, Co)
            in_specs.append(
                pl.BlockSpec((1,) + wt.shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
        else:
            w_ops.append(wt[None, None])           # (1, 1, C)
            in_specs.append(
                pl.BlockSpec((1, 1) + wt.shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
    v_ops = []
    for vec in vectors:
        # (B, 1, C) with (1, 1, C) blocks: every block dim is 1 or the full
        # array dim, which the TPU lowering requires ((1, C) of (B, C) is
        # rejected for B > 1)
        v_ops.append(vec[:, None, :])
        in_specs.append(
            pl.BlockSpec((1, 1, vec.shape[-1]), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, MK, c_out), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, MK, c_out), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(x, *w_ops, *v_ops)
    return out


def fused_chain(x, weights, vectors, spec, interpret: bool = False):
    """Run the grouped MLP chain in one kernel.

    x: (B, M, K, C_in) bf16; returns (B, M, K, C_out) bf16.
    """
    B, M, K, C = x.shape
    out = _chain_call(
        x.reshape(B, M * K, C), tuple(weights), tuple(vectors), tuple(spec),
        interpret,
    )
    return out.reshape(B, M, K, out.shape[-1])
