"""Jitted training steps for the three tasks: DDPM completion, refinement,
and denoising.

Reference: pointnet2/train.py:441-534 (the hot loop).  One fused XLA program
per optimizer step: q-sample + forward + loss + backward + Adam update; with
a mesh, gradients are reduced by XLA collectives instead of the reference's
per-parameter NCCL hooks (distributed.py:109-139), and the loss comes back
already averaged (the reference's `reduce_tensor`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..diffusion.ddpm import q_sample
from ..diffusion.schedule import DiffusionSchedule
from ..models.upsample import point_upsample
from ..ops.chamfer import calc_cd


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array


def create_train_state(params, rng, learning_rate: float = 2e-4) -> tuple[TrainState, optax.GradientTransformation]:
    tx = optax.adam(learning_rate)
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            rng=rng,
        ),
        tx,
    )


def make_completion_train_step(
    model,
    schedule: DiffusionSchedule,
    tx: optax.GradientTransformation,
    record_stats: bool = False,
) -> Callable:
    """DDPM epsilon-MSE step (train.py:524-534 + util.py:258-294).

    With record_stats, the forward also collects the per-module
    'neighbor_stats' histograms (record_neighbor_stats,
    pointnet2_utils.py:423-428) and the step returns (state, loss, stats).
    """

    def loss_fn(params, rng, x0, condition, label):
        B = x0.shape[0]
        rng_t, rng_z = jax.random.split(rng)
        t = jax.random.randint(rng_t, (B,), 0, schedule.T)
        z = jax.random.normal(rng_z, x0.shape, dtype=x0.dtype)
        x_t = q_sample(x0, t, z, schedule)
        if record_stats:
            eps_hat, aux = model.apply(
                params, x_t, condition, t.astype(jnp.float32), label,
                mutable=["neighbor_stats"],
            )
            return (
                jnp.mean(jnp.square(eps_hat - z)),
                aux.get("neighbor_stats", {}),
            )
        eps_hat = model.apply(params, x_t, condition, t.astype(jnp.float32), label)
        return jnp.mean(jnp.square(eps_hat - z))

    def step(state: TrainState, x0, condition, label):
        rng, rng_step = jax.random.split(state.rng)
        if record_stats:
            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, rng_step, x0, condition, label
            )
        else:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, rng_step, x0, condition, label
            )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        if record_stats:
            return new_state, loss, stats
        return new_state, loss

    return step


def make_refine_train_step(
    model,
    tx: optax.GradientTransformation,
    *,
    scale: float = 1.0,
    cd_loss_type: str = "cd_t",
    point_upsample_factor: int = 1,
    include_displacement_center: bool = False,
    intermediate_loss_weight: float = 0.0,
    noise_magnitude: float = 0.0,
    task: str = "refine_completion",
    record_stats: bool = False,
) -> Callable:
    """Refinement / denoise step (train.py:474-522).

    The per-step `output_scale_factor` is a traced argument so the
    QuantityScheduler ramp does not retrigger compilation.

    For task='denoise', `generated` is produced inside the step as
    X + N(0, noise_magnitude) (train.py:462-464).

    With record_stats, the step additionally returns the per-module
    'neighbor_stats' histograms (see make_completion_train_step).
    """
    loss_idx = 1 if cd_loss_type == "cd_t" else 0

    def loss_fn(params, rng, x_gt, condition, label, generated, output_scale_factor):
        if task == "denoise":
            noise = noise_magnitude * jax.random.normal(rng, x_gt.shape, x_gt.dtype)
            generated_in = x_gt + noise
        else:
            generated_in = generated
        stats = {}
        if record_stats:
            displacement, aux = model.apply(
                params, generated_in, condition, None, label,
                mutable=["neighbor_stats"],
            )
            stats = aux.get("neighbor_stats", {})
        else:
            displacement = model.apply(params, generated_in, condition, None, label)
        if point_upsample_factor > 1:
            refined, intermediate = point_upsample(
                generated_in,
                displacement,
                point_upsample_factor,
                include_displacement_center,
                output_scale_factor,
            )
        else:
            refined = generated_in + displacement * output_scale_factor
            intermediate = None
        refined = refined / scale / 2.0
        x = x_gt / scale / 2.0
        loss = calc_cd(refined, x)[loss_idx].mean()
        if intermediate is not None and intermediate_loss_weight > 0:
            inter = intermediate / scale / 2.0
            loss = loss + calc_cd(inter, x)[loss_idx].mean() * intermediate_loss_weight
        if record_stats:
            return loss, stats
        return loss

    def step(state: TrainState, x_gt, condition, label, generated, output_scale_factor):
        rng, rng_step = jax.random.split(state.rng)
        if record_stats:
            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, rng_step, x_gt, condition, label, generated,
                output_scale_factor,
            )
        else:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, rng_step, x_gt, condition, label, generated,
                output_scale_factor,
            )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        if record_stats:
            return new_state, loss, stats
        return new_state, loss

    return step


def jit_step_for_mesh(
    step_fn, mesh, state: TrainState, n_array_args: int, n_scalar_args: int = 0,
    n_extra_outputs: int = 0,
):
    """jit a train step with DP batch sharding + FSDP param sharding over the
    mesh.  Trailing `n_scalar_args` arguments (e.g. the refine step's
    output_scale_factor) are replicated; `n_extra_outputs` extra replicated
    outputs after (state, loss) (e.g. the neighbor-stats collection).
    Returns (jitted_fn, sharded_state)."""
    from ..parallel.mesh import batch_sharding, param_sharding_rule, replicated

    rule = param_sharding_rule(mesh)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    def state_shardings(s):
        params_sh = jax.tree_util.tree_map(
            lambda x: rule(jax.ShapeDtypeStruct(x.shape, x.dtype)), s.params
        )
        opt_sh = jax.tree_util.tree_map(
            lambda x: (
                rule(jax.ShapeDtypeStruct(x.shape, x.dtype))
                if hasattr(x, "shape") and x.ndim >= 2
                else rep
            ),
            s.opt_state,
        )
        return TrainState(step=rep, params=params_sh, opt_state=opt_sh, rng=rep)

    st_sh = state_shardings(state)
    sharded_state = jax.tree_util.tree_map(
        lambda x, sh: jax.device_put(x, sh), state, st_sh
    )
    in_shardings = (st_sh,) + (bsh,) * n_array_args + (rep,) * n_scalar_args
    out_shardings = (st_sh,) + (rep,) * (1 + n_extra_outputs)
    jitted = jax.jit(step_fn, in_shardings=in_shardings, out_shardings=out_shardings)
    return jitted, sharded_state
