"""Diffusion runtime: schedules, training loss, samplers (ancestral + FastDPM)."""

from .schedule import DiffusionSchedule, calc_diffusion_hyperparams, calc_t_emb
from .ddpm import q_sample, training_loss, sampling, make_segmented_sampler, DenoiseFn
from .fastdpm import (
    FastSamplingPlan,
    make_fast_sampling_plan,
    fast_sampling,
    get_VAR_noise,
    get_STEP_step,
    precompute_VAR_steps,
    bisearch,
)

__all__ = [
    "DiffusionSchedule",
    "calc_diffusion_hyperparams",
    "calc_t_emb",
    "q_sample",
    "training_loss",
    "sampling",
    "make_segmented_sampler",
    "DenoiseFn",
    "FastSamplingPlan",
    "make_fast_sampling_plan",
    "fast_sampling",
    "get_VAR_noise",
    "get_STEP_step",
    "precompute_VAR_steps",
    "bisearch",
]
