"""Probe: one-hot MXU gather vs native take_along_axis row gather at the
kNN-FP shapes (B, M, K) from (B, N, C) tables.

The round-1 measurement that picked the one-hot form ("take_along lowers to a
~14 GB/s kLoop") predates the M-minor/transposed-kernel layouts; the r3 trace
shows other take_along row gathers running near the HBM roofline, so re-measure
at the exact fp_0 / fp_1 / SA shapes, inside a scan with varied indices (the
tunnel memoizes repeated executions — see STATUS.md).

Usage: python tools/probe_gather.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=200):
    out = fn(*args, iters)  # compile + warm
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args, iters)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1e6)
    return best  # us/iter


def make_case(B, M, K, N, C, seed=0):
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    idx = jnp.asarray(rng.integers(0, N, size=(B, M, K)).astype(np.int32))
    return table, idx


def run_case(B, M, K, N, C):
    table, idx = make_case(B, M, K, N, C)

    def onehot_body(carry, _):
        t, i = carry
        oh = jax.nn.one_hot(i, N, dtype=jnp.bfloat16)
        out = jnp.einsum("bmkn,bnc->bmkc", oh, t, preferred_element_type=jnp.bfloat16)
        # vary inputs so the tunnel cannot memoize; keep deps real
        i = (i + 1) % N
        t = t + jnp.sum(out, axis=(1, 2))[:, None, :].astype(t.dtype) * 1e-6
        return (t, i), None

    def takealong_body(carry, _):
        t, i = carry
        flat = i.reshape(B, M * K)
        out = jnp.take_along_axis(t, flat[..., None], axis=1).reshape(B, M, K, C)
        i = (i + 1) % N
        t = t + jnp.sum(out, axis=(1, 2))[:, None, :].astype(t.dtype) * 1e-6
        return (t, i), None

    def fancy_body(carry, _):
        t, i = carry
        out = t[jnp.arange(B)[:, None, None], i, :]
        i = (i + 1) % N
        t = t + jnp.sum(out, axis=(1, 2))[:, None, :].astype(t.dtype) * 1e-6
        return (t, i), None

    import functools

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def scan_run(body_id, carry, n):
        body = [onehot_body, takealong_body, fancy_body][body_id]
        return jax.lax.scan(body, carry, None, length=n)

    res = {}
    for name, bid in [("onehot", 0), ("take_along", 1), ("fancy", 2)]:
        fn = functools.partial(scan_run, bid)
        us = timed(lambda c, n, fn=fn: fn(c, n), (table, idx), iters=200)
        res[name] = us
    mb = B * M * K * C * 2 / 1e6
    print(
        f"B{B} M{M} K{K} N{N} C{C}  out={mb:.1f}MB  "
        + "  ".join(f"{k}={v:.1f}us({mb/v*1e3:.0f}GB/s)" for k, v in res.items())
    )


def main():
    # fp_0: 2048 queries gather K=8 from the 1024-pt level, wide features
    run_case(4, 2048, 8, 1024, 136)
    # fp_1: 1024 queries gather K=8 from 256, wider features
    run_case(4, 1024, 8, 256, 264)
    # fp_2 / fp_3 small levels
    run_case(4, 256, 8, 64, 520)
    # SA-2/3 ball-query grouping shapes (K=32)
    run_case(4, 256, 32, 1024, 70)
    run_case(4, 64, 32, 256, 134)
    # FT coarse levels (query_and_group unfused)
    run_case(4, 64, 32, 256, 70)


if __name__ == "__main__":
    main()
