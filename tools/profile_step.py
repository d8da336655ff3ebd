"""Profile one denoiser step (the generation hot loop body) on the real chip
and print the per-op device-time breakdown.

Usage: python tools/profile_step.py [B] [STEPS]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from point_diffusion_refinement_tpu import diffusion
from point_diffusion_refinement_tpu.config import DEFAULT_POINTNET_CONFIG
from point_diffusion_refinement_tpu.models import PointNet2CloudCondition
from point_diffusion_refinement_tpu.utils.profiling import summarize_trace, trace


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    cfg = dict(DEFAULT_POINTNET_CONFIG)
    cfg["compute_dtype"] = "bfloat16"
    model = PointNet2CloudCondition.from_config(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, 2048, 3)).astype(np.float32))
    if os.environ.get("PDR_BENCH_DATA", "surface") == "surface":
        from point_diffusion_refinement_tpu.data.mirror import mirror_and_concat
        from point_diffusion_refinement_tpu.data.synthetic import (
            make_synthetic_clouds,
        )

        _, partials, _ = make_synthetic_clouds(
            max(1, (B + 25) // 26), 2048, 2048, seed=0
        )
        cond = np.array(mirror_and_concat(jnp.asarray(partials[:B]), 3072))
        cond[:, :, :3] *= 2.0
        cond = jnp.asarray(cond)
    else:
        cond = jnp.asarray(
            np.concatenate(
                [
                    rng.uniform(-0.5, 0.5, (B, 3072, 3)),
                    rng.integers(0, 2, (B, 3072, 1)) * 2.0 - 1.0,
                ],
                axis=-1,
            ).astype(np.float32)
        )
    # PDR_PROFILE_XT=file.npz:key seeds x from a captured sampler state so
    # the profiled step sees the real x_t distribution (uniform-cube seeds
    # overstate window overflows)
    seed_spec = os.environ.get("PDR_PROFILE_XT")
    if seed_spec:
        path, key = seed_spec.rsplit(":", 1)
        xt = np.load(path)[key]
        x = jnp.asarray(np.resize(xt, (B,) + xt.shape[1:]), jnp.float32)
    label = jnp.zeros((B,), jnp.int32)
    ts = jnp.zeros((B,), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x, cond, ts, label)
    schedule = diffusion.calc_diffusion_hyperparams(1000, 1e-4, 0.02)

    windowed = os.environ.get("PDR_WINDOWED_FT", "1") != "0"

    @jax.jit
    def encode(params, cond):
        return model.apply(
            params, cond, windowed_ft=windowed, method=model.encode_condition
        )

    cond_feats = encode(params, cond)
    jax.block_until_ready(cond_feats)

    @functools.partial(jax.jit, static_argnums=(5,))
    def run(params, cond_feats, label, x, rng, n):
        def body(carry, t):
            x, rng = carry
            rng, k = jax.random.split(rng)
            tsb = jnp.full((B,), t, dtype=jnp.float32)
            eps = model.apply(params, x, tsb, label, cond_feats, method=model.denoise)
            alpha_t = schedule.alpha[t]
            abar_t = schedule.alpha_bar[t]
            x = (x - (1.0 - alpha_t) / jnp.sqrt(1.0 - abar_t) * eps) / jnp.sqrt(alpha_t)
            z = jax.random.normal(k, x.shape, dtype=x.dtype)
            x = x + jnp.where(t > 0, schedule.sigma[t], 0.0) * z
            return (x, rng), None

        (x, _), _ = jax.lax.scan(body, (x, rng), jnp.arange(n, 0, -1))
        return x

    out = run(params, cond_feats, label, x, jax.random.key(1), STEPS)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    out = run(params, cond_feats, label, x, jax.random.key(2), STEPS)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"B={B} {STEPS} steps: {dt:.3f}s = {dt / STEPS * 1e3:.2f} ms/step "
          f"-> {B / (dt / STEPS) / 1000:.3f} completions/s/chip @T=1000")

    log_dir = "/tmp/pdr_trace"
    with trace(log_dir):
        out = run(params, cond_feats, label, x, jax.random.key(3), STEPS)
        jax.block_until_ready(out)
    rows = summarize_trace(log_dir, top=40, long_names=True)
    total = sum(d for _, d, _ in rows)
    print(f"top ops (of {total/1e3:.1f} ms total captured):")
    for name, dur, cnt in rows:
        print(f"  {dur/1e3:9.2f} ms  x{cnt:5d}  {name[:240]}")


if __name__ == "__main__":
    main()
