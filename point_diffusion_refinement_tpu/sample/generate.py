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
    mesh=None,
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

    With `mesh`, generation runs data-parallel over the mesh's `data` axis:
    inputs are sharded batch-first, params replicated, and XLA inserts the
    collectives — the SPMD replacement for the reference's per-GPU
    DataParallel inference (completion_eval.py:113-118) and per-rank
    generation subprocesses (generate_samples_distributed.py:186-203).
    The batch size must divide by the data-axis size (see
    `pad_batch_rows` in sample/pipeline.py).
    """

    slices_t = tuple(int(t) for t in t_slices) if t_slices else ()

    bsh = rep = None
    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated

        bsh, rep = batch_sharding(mesh), replicated(mesh)

    # Inference-only windowed fused ball-gather for the level-0 FT pair
    # (ops/pallas_window.py); ineligible configs/models silently keep the
    # unfused path.  PDR_WINDOWED_FT=0 disables.
    import inspect
    import os

    enc_kwargs = {}
    if os.environ.get("PDR_WINDOWED_FT", "1") != "0" and "windowed_ft" in (
        inspect.signature(model.encode_condition).parameters
    ):
        enc_kwargs = {"windowed_ft": True}

    @jax.jit
    def _encode(params, condition):
        return model.apply(
            params, condition, method=model.encode_condition, **enc_kwargs
        )

    def _denoise_apply(params, batch_ctx, x, ts):
        label, cond_feats = batch_ctx
        return model.apply(params, x, ts, label, cond_feats, method=model.denoise)

    seg_sampler = None
    if segment_size is not None:
        seg_sampler = ddpm.make_segmented_sampler(
            _denoise_apply, schedule, segment_size, t_slices=t_slices, mesh=mesh
        )

    def sampler(params, rng, condition, label, XT=None):
        B = condition.shape[0]
        shape = (B, num_points, 3)
        if mesh is not None:
            # jax.device_put acts as a sharding constraint under jit and as
            # real placement eagerly, so this works in both sampler modes
            condition = jax.device_put(condition, bsh)
            label = jax.device_put(label, bsh)
            if XT is not None:
                XT = jax.device_put(XT, bsh)
        if seg_sampler is not None:
            cond_feats = _encode(params, condition)
            return seg_sampler(
                params, (label, cond_feats), rng, shape, XT,
                warm_start_step if XT is not None else None,
            )

        cond_feats = model.apply(
            params, condition, method=model.encode_condition, **enc_kwargs
        )

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
