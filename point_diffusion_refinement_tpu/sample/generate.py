"""Coarse-cloud generation: condition-encode once, scan the reverse process.

Reference: completion_eval.evaluate's sampling path
(completion_eval.py:129-207) driving util.py:184-255 / util_fastdpmv2.py.
The reference launches T=1000 Python-loop forwards with a replica feature
cache; here the whole generation (condition encoding + T-step reverse scan +
un-augmentation) is ONE jitted program, and multi-chip generation is the same
program with the batch sharded over the mesh — no per-rank subprocesses, no
filesystem gather (generate_samples_distributed.py:26-97 collapses into an
all-gather).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..diffusion import ddpm, fastdpm
from ..diffusion.schedule import DiffusionSchedule


def make_coarse_sampler(
    model,
    schedule: DiffusionSchedule,
    num_points: int,
    *,
    fast_plan: Optional[fastdpm.FastSamplingPlan] = None,
    t_slices: Optional[Sequence[int]] = None,
    warm_start_step: Optional[int] = None,
    segment_size: Optional[int] = None,
):
    """Build a sampler.

    Returns fn(params, rng, condition, label, XT=None) -> x0 (B, N, 3)
    [, {t: slice}].  The condition branch runs exactly once; its features are
    closed over by the scan body (the reference's
    `use_retained_condition_feature` made structural).

    With `segment_size`, the T reverse steps run as multiple jitted segment
    executions (host-carried state) instead of one long device program —
    use for very long schedules where a single multi-minute execution is
    fragile (e.g. tunneled chips); do NOT wrap the returned fn in jax.jit
    in that mode.
    """

    slices_t = tuple(int(t) for t in t_slices) if t_slices else ()
    ts_arr = jnp.asarray(slices_t, dtype=jnp.int32) if slices_t else None

    @jax.jit
    def _encode(params, condition):
        return model.apply(params, condition, method=model.encode_condition)

    @jax.jit
    def _run_segment(params, label, cond_feats, x, slice_buf, rng, steps):
        """One chunk of the reverse process; compiled once, reused for every
        batch and segment (params/features are traced args, not constants)."""
        B = x.shape[0]

        def body(carry, t):
            x, slice_buf, rng = carry
            rng, rng_z = jax.random.split(rng)
            tsb = jnp.full((B,), t, dtype=jnp.float32)
            eps = model.apply(params, x, tsb, label, cond_feats, method=model.denoise)
            alpha_t = schedule.alpha[t]
            abar_t = schedule.alpha_bar[t]
            x = (x - (1.0 - alpha_t) / jnp.sqrt(1.0 - abar_t) * eps) / jnp.sqrt(alpha_t)
            if slices_t:
                hit = (ts_arr == t)[:, None, None, None]
                slice_buf = jnp.where(hit, x[None], slice_buf)
            z = jax.random.normal(rng_z, x.shape, dtype=x.dtype)
            x = x + jnp.where(t > 0, schedule.sigma[t], 0.0) * z
            return (x, slice_buf, rng), None

        (x, slice_buf, rng), _ = jax.lax.scan(body, (x, slice_buf, rng), steps)
        return x, slice_buf, rng

    def sampler(params, rng, condition, label, XT=None):
        B = condition.shape[0]
        shape = (B, num_points, 3)
        if segment_size is not None:
            cond_feats = _encode(params, condition)
            rng_init, rng_loop = jax.random.split(rng)
            if XT is not None:
                assert warm_start_step is not None
                z = jax.random.normal(rng_init, shape, dtype=jnp.float32)
                x = XT + schedule.sigma[warm_start_step] * z
                start = warm_start_step - 1
            else:
                x = jax.random.normal(rng_init, shape, dtype=jnp.float32)
                start = schedule.T - 1
            slice_buf = jnp.zeros((len(slices_t),) + shape, dtype=jnp.float32)
            steps = list(range(start, -1, -1))
            for i in range(0, len(steps), segment_size):
                chunk = jnp.asarray(steps[i : i + segment_size], dtype=jnp.int32)
                x, slice_buf, rng_loop = _run_segment(
                    params, label, cond_feats, x, slice_buf, rng_loop, chunk
                )
            if slices_t:
                return x, {t: slice_buf[i] for i, t in enumerate(slices_t)}
            return x

        cond_feats = model.apply(params, condition, method=model.encode_condition)

        def denoise_fn(x, ts):
            return model.apply(
                params, x, ts, label, cond_feats, method=model.denoise
            )

        if fast_plan is not None:
            return fastdpm.fast_sampling(rng, denoise_fn, shape, fast_plan)
        return ddpm.sampling(
            rng,
            denoise_fn,
            shape,
            schedule,
            t_slices=t_slices,
            XT=XT,
            warm_start_step=warm_start_step if XT is not None else None,
        )

    return sampler


def make_refiner(
    model,
    *,
    point_upsample_factor: int = 1,
    include_displacement_center: bool = False,
):
    """One-forward refinement (completion_eval.py:159-168)."""
    from ..models.upsample import point_upsample

    def refine(params, coarse, condition, label, output_scale_factor):
        displacement = model.apply(params, coarse, condition, None, label)
        if point_upsample_factor > 1:
            refined, _ = point_upsample(
                coarse,
                displacement,
                point_upsample_factor,
                include_displacement_center,
                output_scale_factor,
            )
        else:
            refined = coarse + displacement * output_scale_factor
        return refined

    return refine


def unaugment(x: jax.Array, M_inv: jax.Array, translation: jax.Array) -> jax.Array:
    """Undo the shared per-sample augmentation after generation:
    x = (x - translation) @ M_inv  (completion_eval.py:203-205,
    mvp_data_utils.py:51-59).

    Full f32 precision: the contraction depth is 3 so the MXU's bf16 default
    would cost ~1e-3 coordinate error — the same order as the CD convergence
    thresholds (BASELINE.md) — for zero speedup."""
    return jnp.einsum(
        "bnc,bcd->bnd",
        x - translation,
        M_inv,
        precision=jax.lax.Precision.HIGHEST,
    )
