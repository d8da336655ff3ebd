"""Point Diffusion-Refinement (PDR), TPU-native.

A from-scratch JAX/Flax/Pallas re-design of the conditional point-diffusion
refinement paradigm for 3D point-cloud completion (reference:
ZhaoyangLyu/Point_Diffusion_Refinement).  Everything is built for XLA:TPU —
static shapes, fused neighbor gathers, `lax.scan` reverse diffusion, and
`jax.sharding` data/model parallelism instead of NCCL process groups.

Layers (bottom → top):
  ops/        fixed-shape geometry kernels (FPS, ball query, kNN, grouping,
              3-NN interpolation, Chamfer, auction EMD) — pure XLA + Pallas
  models/     Flax modules: conditioned MLP blocks, set abstraction,
              feature propagation, feature transfer, attention pooling,
              the dual-path conditional denoiser, refinement/upsampling
  diffusion/  DDPM schedule + training loss + scan-based samplers + FastDPM
  data/       MVP h5 loading, mirroring, augmentation, synthetic data
  parallel/   mesh construction and sharded train/sample steps
  train/      training loop, checkpointing, schedulers
  sample/     generation pipeline (coarse DDPM sampling, t-slices, XT warm
              start), refinement driver
  metrics/    Chamfer/F1/EMD + generation-quality metrics (MMD/COV/1-NNA/JSD)
  config/     JSON experiment-config loading compatible with the reference
              config schema
"""

__version__ = "0.1.0"
