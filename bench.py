"""North-star benchmark: coarse-completion generation throughput at T=1000.

Reference baseline (BASELINE.md): the full MVP test set (41,600 completions,
T=1000, batch 32/GPU) took ~21 h on 8x RTX 2080 Ti => 0.069 completions/sec
per chip.  We time the full 1000-step reverse scan (condition encoding
included) of the shipped MVP model config on one chip and report
completions/sec/chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_COMPLETIONS_PER_SEC_PER_CHIP = 0.069  # BASELINE.md derived
T = int(os.environ.get("PDR_BENCH_T", "1000"))
# B=4 measured optimal on v5e: per-sample cost grows superlinearly past it
# (the (B, M, K, C) neighborhood intermediates blow past VMEM); swept
# B in {2,4,8,16,32,64} -> 0.38/0.42/0.40/0.35/0.31/0.30 completions/s/chip
# (re-swept {4,8,16} post-optimization: 0.66/0.62/0.56 — B=4 still wins)
BATCH = int(os.environ.get("PDR_BENCH_BATCH", "4"))
# min-of-3: the tunnel serves 2-3x degraded stretches after sustained load
# (STATUS.md gotchas); the min over repeats of an identical program is the
# honest hardware number and costs ~8 s extra
REPEATS = int(os.environ.get("PDR_BENCH_REPEATS", "3"))
DTYPE = os.environ.get("PDR_BENCH_DTYPE", "bfloat16")
# "surface" (default) conditions the model on mirrored+FPS'd synthetic
# surface partials — the realistic MVP-like density the adaptive-window
# kernels must face; "uniform" keeps the round-1 uniform-random clouds
DATA = os.environ.get("PDR_BENCH_DATA", "surface")


def main():
    from point_diffusion_refinement_tpu import diffusion
    from point_diffusion_refinement_tpu.config import DEFAULT_POINTNET_CONFIG
    from point_diffusion_refinement_tpu.models import PointNet2CloudCondition
    from point_diffusion_refinement_tpu.sample import make_coarse_sampler

    cfg = dict(DEFAULT_POINTNET_CONFIG)
    cfg["compute_dtype"] = DTYPE
    model = PointNet2CloudCondition.from_config(cfg)
    rng = np.random.default_rng(0)
    B = BATCH
    x = jnp.asarray(rng.uniform(-1, 1, (B, 2048, 3)).astype(np.float32))
    if DATA == "surface":
        # MVP-like conditions: synthetic surface partials, mirrored + FPS'd
        # to 3072 points with the +/-1 mirror-flag channel, scaled to [-1,1]
        from point_diffusion_refinement_tpu.data.mirror import mirror_and_concat
        from point_diffusion_refinement_tpu.data.synthetic import (
            make_synthetic_clouds,
        )

        _, partials, _ = make_synthetic_clouds(
            max(1, (B + 25) // 26), 2048, 2048, seed=0
        )
        cond = np.array(mirror_and_concat(jnp.asarray(partials[:B]), 3072))
        cond[:, :, :3] *= 2.0  # scale=1 convention: data x 2*scale
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
    label = jnp.zeros((B,), jnp.int32)
    ts = jnp.zeros((B,), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x, cond, ts, label)

    schedule = diffusion.calc_diffusion_hyperparams(T, 1e-4, 0.02)
    # segment the reverse process into ~13s device executions: a single
    # multi-minute execution is fragile on tunneled chips and adds <1%
    # dispatch overhead when chunked
    seg = min(T, int(os.environ.get("PDR_BENCH_SEGMENT", "200")))
    sampler = make_coarse_sampler(
        model, schedule, num_points=2048, segment_size=seg
    )

    # compile + warmup
    out = sampler(params, jax.random.key(1), cond, label)
    jax.block_until_ready(out)

    times = []
    attempts = 0
    while len(times) < REPEATS and attempts < REPEATS + 2:
        attempts += 1
        try:
            t0 = time.perf_counter()
            out = sampler(params, jax.random.key(2 + attempts), cond, label)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        except Exception as e:  # transient tunnel/device flake: retry
            print(f"# bench attempt {attempts} failed: {e}", flush=True)
    dt = min(times)
    completions_per_sec = B / dt
    # normalize to the reference's T=1000 step count if benching a shorter T
    norm = completions_per_sec * (T / 1000.0)
    result = {
        "metric": "mvp_coarse_completions_per_sec_per_chip_T1000",
        "value": round(norm, 4),
        "unit": "completions/s/chip",
        "vs_baseline": round(norm / BASELINE_COMPLETIONS_PER_SEC_PER_CHIP, 2),
    }
    if T != 1000:
        # the T=50 record compares against the reference's FastDPM-50
        # pipeline: 41,600 completions in ~1 h on 8 GPUs => 1.44/s/chip
        # (README.md:97, BASELINE.md) — report the un-normalized rate too
        result["T"] = T
        result["raw_completions_per_sec_per_chip"] = round(
            completions_per_sec, 4
        )
        if T == 50:
            result["vs_baseline_T50"] = round(completions_per_sec / 1.44, 2)

    # ---- arithmetic-efficiency accounting (VERDICT r3 item 3) ------------
    # FLOPs from the traced jaxprs: 'model' = the network's own matmuls,
    # 'gather' = structural one-hot gather contractions (MXU-encoded
    # gathers), 'pallas' = analytic in-kernel MACs of the windowed kernels
    # (XLA cost analysis reports 0 for custom calls).  utils/flops.py.
    try:
        from point_diffusion_refinement_tpu.utils.flops import (
            V5E_BF16_PEAK_FLOPS,
            dot_flops,
        )

        def _encode(p, c):
            return model.apply(
                p, c, windowed_ft=True, method=model.encode_condition
            )

        enc = dot_flops(_encode, params, cond)
        cf_struct = jax.eval_shape(_encode, params, cond)

        def _step(p, cf, xx, tt):
            return model.apply(
                p, xx, tt, label, cf, method=model.denoise
            )

        step = dot_flops(_step, params, cf_struct, x, ts)
        step_total = sum(step.values())
        total = sum(enc.values()) + T * step_total  # whole-batch FLOPs
        step_ms = dt / T * 1000.0  # includes amortized encode + dispatch
        result.update(
            {
                "step_ms": round(step_ms, 4),
                "model_gflops_per_step": round(step["model"] / 1e9, 2),
                "gather_gflops_per_step": round(step["gather"] / 1e9, 2),
                "pallas_gflops_per_step": round(step["pallas"] / 1e9, 2),
                "tflops_per_sec": round(total / dt / 1e12, 2),
                "mfu": round(total / dt / V5E_BF16_PEAK_FLOPS, 4),
                "model_mfu": round(
                    T * step["model"] / dt / V5E_BF16_PEAK_FLOPS, 4
                ),
            }
        )
    except Exception as e:  # accounting must never sink the bench
        result["flops_error"] = str(e)[:200]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
