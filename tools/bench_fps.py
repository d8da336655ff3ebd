"""On-chip microbenchmark: FPS Pallas kernel, baseline vs stacked-extract.

Times the kernel standalone at the model's FPS shapes.  STATUS.md warning
applies: standalone timings mislead — confirm any win with the full-step
bench before changing defaults.

Usage: python tools/bench_fps.py [B]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from point_diffusion_refinement_tpu.ops.pallas_fps import _fps_pallas_impl


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rng = np.random.default_rng(0)
    for N, npoint in [(2048, 1024), (3072, 1024), (1024, 256)]:
        xyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
        ts = {}
        for stacked in (False, True):
            # perturb input each call to defeat tunnel memoization
            def run_varied(i, s=stacked):
                return _fps_pallas_impl(
                    xyz + jnp.float32(i) * 1e-7, npoint, False, s
                )

            run_varied(0)  # compile
            t0 = time.perf_counter()
            reps = 20
            outs = [run_varied(i + 1) for i in range(reps)]
            jax.block_until_ready(outs)
            ts[stacked] = (time.perf_counter() - t0) / reps
        print(
            f"B={B} N={N} npoint={npoint}: base {ts[False]*1e3:.3f} ms  "
            f"stacked {ts[True]*1e3:.3f} ms  "
            f"({ts[False]/ts[True]:.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
