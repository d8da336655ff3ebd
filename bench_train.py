"""Training-throughput benchmark: DDPM completion train step on one chip.

Reference baseline (README.md:50): 340 epochs over the MVP train set
(2,400 GT shapes x 26 partials = 62,400 samples) with batch 32 took ~5 days
on 8x RTX 2080 Ti => 340 * 62,400 / (5 * 24 * 3600) / 8 ~= 6.1
samples/sec per chip.

Times the full jitted step (q-sample + forward + backward + Adam) of the
shipped MVP model config.  Prints one JSON line like bench.py.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SAMPLES_PER_SEC_PER_CHIP = 6.1
BATCH = int(os.environ.get("PDR_BENCH_TRAIN_BATCH", "32"))
STEPS = int(os.environ.get("PDR_BENCH_TRAIN_STEPS", "20"))
DTYPE = os.environ.get("PDR_BENCH_DTYPE", "bfloat16")


def main():
    from point_diffusion_refinement_tpu import diffusion
    from point_diffusion_refinement_tpu.config import DEFAULT_POINTNET_CONFIG
    from point_diffusion_refinement_tpu.data.mirror import mirror_and_concat
    from point_diffusion_refinement_tpu.data.synthetic import make_synthetic_clouds
    from point_diffusion_refinement_tpu.models import PointNet2CloudCondition
    from point_diffusion_refinement_tpu.train import (
        create_train_state,
        make_completion_train_step,
    )

    cfg = dict(DEFAULT_POINTNET_CONFIG)
    cfg["compute_dtype"] = DTYPE
    model = PointNet2CloudCondition.from_config(cfg)
    rng = np.random.default_rng(0)
    B = BATCH
    completes, partials, labels = make_synthetic_clouds(
        max(1, (B + 25) // 26), 2048, 2048, seed=0
    )
    x0 = jnp.asarray(np.resize(completes, (B, 2048, 3)).astype(np.float32)) * 2.0
    cond = np.array(mirror_and_concat(jnp.asarray(partials[:, :2048]), 3072))
    cond = jnp.asarray(np.resize(cond, (B, 3072, 4)).astype(np.float32))
    cond = cond.at[:, :, :3].mul(2.0)
    label = jnp.asarray(np.resize(labels, (B,)).astype(np.int32))
    ts = jnp.zeros((B,), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x0, cond, ts, label)

    schedule = diffusion.calc_diffusion_hyperparams(1000, 1e-4, 0.02)
    state, tx = create_train_state(params, jax.random.key(1), 2e-4)
    step = jax.jit(make_completion_train_step(model, schedule, tx))

    state, loss = step(state, x0, cond, label)  # compile + warmup
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for i in range(STEPS):
        # perturb inputs so the tunnel cannot memoize identical executions
        state, loss = step(state, x0 + jnp.float32(i) * 1e-6, cond, label)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / STEPS
    samples_per_sec = B / dt
    result = {
        "metric": "mvp_ddpm_train_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC_PER_CHIP, 2),
    }
    # arithmetic-efficiency accounting (VERDICT r3 item 3); see bench.py
    try:
        from point_diffusion_refinement_tpu.utils.flops import (
            V5E_BF16_PEAK_FLOPS,
            dot_flops,
        )

        fl = dot_flops(
            make_completion_train_step(model, schedule, tx),
            state, x0, cond, label,
        )
        total = sum(fl.values())
        result.update(
            {
                "step_ms": round(dt * 1000.0, 2),
                "model_gflops_per_step": round(fl["model"] / 1e9, 2),
                "gather_gflops_per_step": round(fl["gather"] / 1e9, 2),
                "tflops_per_sec": round(total / dt / 1e12, 2),
                "mfu": round(total / dt / V5E_BF16_PEAK_FLOPS, 4),
                "model_mfu": round(fl["model"] / dt / V5E_BF16_PEAK_FLOPS, 4),
            }
        )
    except Exception as e:
        result["flops_error"] = str(e)[:200]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
