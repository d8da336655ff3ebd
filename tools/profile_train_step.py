"""Profile one jitted DDPM train step (fwd+bwd+Adam) on the real chip.

Usage: python tools/profile_train_step.py [B] [STEPS]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from point_diffusion_refinement_tpu import diffusion
from point_diffusion_refinement_tpu.config import DEFAULT_POINTNET_CONFIG
from point_diffusion_refinement_tpu.data.mirror import mirror_and_concat
from point_diffusion_refinement_tpu.data.synthetic import make_synthetic_clouds
from point_diffusion_refinement_tpu.models import PointNet2CloudCondition
from point_diffusion_refinement_tpu.train import (
    create_train_state,
    make_completion_train_step,
)
from point_diffusion_refinement_tpu.utils.profiling import summarize_trace, trace


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cfg = dict(DEFAULT_POINTNET_CONFIG)
    cfg["compute_dtype"] = "bfloat16"
    model = PointNet2CloudCondition.from_config(cfg)
    completes, partials, labels = make_synthetic_clouds(
        max(1, (B + 25) // 26), 2048, 2048, seed=0
    )
    x0 = jnp.asarray(np.resize(completes, (B, 2048, 3)).astype(np.float32)) * 2.0
    cond = np.array(mirror_and_concat(jnp.asarray(partials[:, :2048]), 3072))
    cond = jnp.asarray(np.resize(cond, (B, 3072, 4)).astype(np.float32))
    cond = cond.at[:, :, :3].mul(2.0)
    label = jnp.asarray(np.resize(labels, (B,)).astype(np.int32))
    params = jax.jit(model.init)(
        jax.random.key(0), x0, cond, jnp.zeros((B,), jnp.float32), label
    )
    schedule = diffusion.calc_diffusion_hyperparams(1000, 1e-4, 0.02)
    state, tx = create_train_state(params, jax.random.key(1), 2e-4)
    step = jax.jit(make_completion_train_step(model, schedule, tx))
    state, loss = step(state, x0, cond, label)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, loss = step(state, x0 + jnp.float32(i) * 1e-6, cond, label)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"B={B}: {dt*1e3:.1f} ms/step = {B/dt:.1f} samples/s/chip")

    log_dir = "/tmp/pdr_train_trace"
    with trace(log_dir):
        for i in range(3):
            state, loss = step(state, x0 + jnp.float32(100 + i) * 1e-6, cond, label)
        jax.block_until_ready(loss)
    rows = summarize_trace(log_dir, top=35, long_names=True)
    total = sum(d for _, d, _ in rows)
    print(f"top ops (of {total/1e3:.1f} ms total captured over 3 steps):")
    for name, dur, cnt in rows:
        print(f"  {dur/1e3:9.2f} ms  x{cnt:5d}  {name[:200]}")


if __name__ == "__main__":
    main()
