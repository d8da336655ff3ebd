"""On-chip microbenchmark: AttentionPool at the shipped config's dominant
shapes (FT-0, KnnFP-0, SA-0 level shapes).

Prints per-instance wall time for the XLA path (and the fused Pallas path
when PDR_FUSED_ATTENTION=1), with inputs varied across reps to defeat the
tunnel's memoization.

Usage: python tools/bench_attention.py [B]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from point_diffusion_refinement_tpu.models.attention import AttentionPool


CASES = [
    # name, M, K, Cq, Ck, Cv(c_out of producing MLP), c_out, counts?
    ("FT0", 2048, 32, 4, 38, 32, 32, True),
    ("FT1", 1024, 32, 35, 38, 32, 32, True),
    ("SA0", 1024, 32, 35, 44, 32, 64, True),
    ("SA1", 256, 32, 96, 70, 64, 128, True),
    ("KnnFP0", 2048, 8, 128, 166, 128, 128, False),
    ("KnnFP1", 1024, 8, 256, 331, 128, 128, False),
]


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rng = np.random.default_rng(0)
    total = 0.0
    for name, M, K, Cq, Ck, Cv, c_out, use_counts in CASES:
        mod = AttentionPool(c_out, dtype=jnp.bfloat16)
        feat = jnp.asarray(rng.standard_normal((B, M, Cq)).astype(np.float32))
        grouped = jnp.asarray(
            rng.standard_normal((B, M, K, Ck)).astype(np.float32)
        ).astype(jnp.bfloat16)
        gfo = jnp.asarray(
            rng.standard_normal((B, M, K, Cv)).astype(np.float32)
        ).astype(jnp.bfloat16)
        counts = (
            jnp.asarray(rng.integers(1, K + 1, (B, M)).astype(np.int32))
            if use_counts
            else "all"
        )
        params = mod.init(jax.random.key(0), feat, grouped, gfo, counts)

        if use_counts:
            @jax.jit
            def run(p, f, g, v, c):
                return mod.apply(p, f, g, v, c)
            args = (params, feat, grouped, gfo, counts)
        else:
            @jax.jit
            def run(p, f, g, v):
                return mod.apply(p, f, g, v, "all")
            args = (params, feat, grouped, gfo)

        jax.block_until_ready(run(*args))
        reps = 30
        t0 = time.perf_counter()
        outs = []
        for i in range(reps):
            a = (args[0], args[1] + jnp.float32(i) * 1e-6) + args[2:]
            outs.append(run(*a))
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / reps
        total += dt
        print(f"{name}: B={B} M={M} K={K} Ck={Ck} c_out={c_out}: "
              f"{dt*1e3:.3f} ms", flush=True)
    print(f"sum of cases: {total*1e3:.3f} ms")


if __name__ == "__main__":
    main()
