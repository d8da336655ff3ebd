"""The training driver: config-in, checkpoints/eval/logs out.

Reference: pointnet2/train.py:295-714 and the launcher distributed.py.
Differences by design (TPU-native):
  * one process drives all local chips through a jitted SPMD step — there is
    no per-GPU subprocess fan-out, no NCCL process group, no
    CUDA_VISIBLE_DEVICES rewriting (distributed.py:149-228);
  * multi-host runs shard the dataset by jax.process_index() exactly where
    the reference sharded by rank (mvp_dataset.py:149-210);
  * the eval-in-loop writes the same gathered pickle schema
    (train.py:128-257) so `find_max_epoch(mode='best')` keeps working.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.loader import load_config
from ..data import MVPDataset, MVPDatasetConfig, iterate_batches
from ..diffusion import calc_diffusion_hyperparams
from ..models import PointNet2CloudCondition, PointwiseNet
from ..parallel import make_mesh, shard_batch
from ..sample import evaluate, make_coarse_sampler, make_refiner
from ..utils import AverageMeter, TensorBoardLogger
from .checkpoints import maybe_resume, save_checkpoint
from .scheduler import QuantityScheduler
from .step import (
    create_train_state,
    jit_step_for_mesh,
    make_completion_train_step,
    make_refine_train_step,
)


def local_experiment_path(config: dict) -> str:
    """Experiment directory naming (train.py:320-326)."""
    dc = config["diffusion_config"]
    pc = config["pointnet_config"]
    path = f"T{dc['T']}_betaT{dc['beta_T']}_{pc['model_name']}"
    if config["train_config"].get("task") == "refine_completion":
        refine = config.get("refine_config", {})
        exp = refine.get("exp_name", "refine")
        head, tail = os.path.split(exp)
        path = os.path.join(path, head, f"refine_exp_{tail}")
    return path


def build_model(pointnet_config: dict):
    network_type = pointnet_config.get("network_type", "pointnet++")
    if network_type == "pointnet++":
        return PointNet2CloudCondition.from_config(pointnet_config)
    if network_type == "pointwise_net":
        return PointwiseNet(**pointnet_config["network_args"])
    if network_type == "pvd":
        from ..models.pvcnn import PVCNN2Completion

        return PVCNN2Completion(**pointnet_config["network_args"])
    raise ValueError(network_type)


def make_dataset(trainset_config: dict, phase, rank: int, world: int,
                 eval_subset: Optional[int] = None):
    """Phase-aware dataset factory (dataset.py:21-77 get_dataloader).

    phase: 'train' (train split, augmented, padded last rank),
    'test'/'val' (test split, no augmentation), or 'test_trainset' (train
    split evaluated without augmentation — unless the config sets
    augment_data_during_generation, generate_samples.py:374-393).
    Booleans are accepted for compatibility: True == 'train', False == 'test'.
    """
    if isinstance(phase, bool):
        phase = "train" if phase else "test"
    assert phase in ("train", "val", "test", "test_trainset"), phase
    train = phase == "train"
    train_split = train or phase == "test_trainset"
    aug = trainset_config.get("augmentation") if train else None
    if not train and trainset_config.get("augment_data_during_generation", False):
        aug = trainset_config.get("augmentation")  # dataset.py:56-57
    random_trials = trainset_config.get("randomly_select_generated_samples", False)
    return MVPDataset(
        MVPDatasetConfig(
            data_dir=trainset_config["data_dir"],
            train=train_split,
            npoints=trainset_config.get("npoints", 2048),
            novel_input=trainset_config.get("novel_input", True),
            novel_input_only=trainset_config.get("novel_input_only", False),
            scale=trainset_config.get("scale", 1),
            rank=rank,
            world_size=world,
            augmentation=aug if isinstance(aug, dict) else None,
            return_augmentation_params=trainset_config.get(
                "return_augmentation_params", False
            ),
            random_subsample=eval_subset is not None,
            num_samples=eval_subset or 0,
            include_generated_samples=trainset_config.get(
                "include_generated_samples", False
            ),
            generated_sample_path=trainset_config.get("generated_sample_path"),
            # test phase never picks random trials (dataset.py:42-46)
            randomly_select_generated_samples=random_trials and train_split,
            use_mirrored_partial_input=trainset_config.get(
                "use_mirrored_partial_input", False
            ),
            number_partial_points=trainset_config.get("number_partial_points", 2048),
            load_pre_computed_XT=trainset_config.get("load_pre_computed_XT", False),
            T_step=trainset_config.get("T_step", 100),
            XT_folder=trainset_config.get("XT_folder"),
            append_samples_to_last_rank=train,  # eval: no padding (train.py:51-55)
        )
    )


def make_eval_sampler(model, schedule, diffusion_config: dict,
                      num_points: int, eval_T: int, mesh=None):
    """Sampler for the in-loop eval (train.py:568-631).

    `eval_sampling_steps` (eval_T) > 0 runs a FastDPM VAR plan of that
    length — the shipped fast-sampling recipe (var/quadratic/kappa=0.5,
    README.md:97) — instead of the full ancestral schedule, making each
    checkpoint eval ~T/eval_T cheaper.  Returns (sampler_fn, steps_per_sample).
    """
    from ..diffusion import fastdpm

    fast_plan = None
    if 0 < eval_T < schedule.T:
        fast_plan = fastdpm.make_fast_sampling_plan(
            schedule,
            diffusion_config["T"],
            diffusion_config["beta_0"],
            diffusion_config["beta_T"],
            length=eval_T,
            sampling_method="var",
            noise_schedule="quadratic",
            kappa=0.5,
        )
    # segment long schedules into bounded device executions (see
    # sample/generate.py); short/fast ones run as one jitted program
    seg = 200 if (fast_plan is None and schedule.T > 200) else None
    sampler = make_coarse_sampler(
        model, schedule, num_points=num_points,
        fast_plan=fast_plan, segment_size=seg, mesh=mesh,
    )
    if seg is None:
        sampler = jax.jit(sampler)
    n_steps = int(fast_plan.tau.shape[0]) if fast_plan is not None else int(schedule.T)
    return sampler, n_steps


def train(config: dict, *, max_steps: Optional[int] = None, mesh=None,
          dataset_override=None, eval_dataset_override=None,
          trainset_eval_dataset_override=None) -> dict:
    """Run training per the JSON config.  `max_steps` truncates for smoke
    runs; dataset overrides let tests inject synthetic data."""
    train_config = config["train_config"]
    pointnet_config = config["pointnet_config"]
    diffusion_config = config["diffusion_config"]
    trainset_config = config.get("mvp_dataset_config", config.get("dataset_config", {}))
    refine_config = config.get("refine_config", {})
    task = train_config.get("task", "completion")

    rank = jax.process_index()
    world = jax.process_count()
    root = train_config.get("root_directory", "exp")
    local_path = local_experiment_path(config)
    output_directory = os.path.join(
        root, local_path, train_config.get("output_directory", "logs/checkpoint")
    )
    os.makedirs(output_directory, exist_ok=True)
    tb = TensorBoardLogger(
        os.path.join(
            root, local_path, train_config.get("tensorboard_directory", "logs/tb")
        )
    )

    schedule = calc_diffusion_hyperparams(
        diffusion_config["T"], diffusion_config["beta_0"], diffusion_config["beta_T"]
    )
    model = build_model(pointnet_config)

    dataset = dataset_override or make_dataset(trainset_config, True, rank, world)
    batch_size = trainset_config.get("batch_size", 32)
    loader_len = max(1, len(dataset) // batch_size)
    n_epochs = train_config.get("n_epochs", 1)
    n_iters = int(loader_len * n_epochs)
    if max_steps is not None:
        n_iters = min(n_iters, max_steps)
    iters_per_ckpt = int(loader_len * train_config.get("epochs_per_ckpt", 1))
    iters_per_logging = train_config.get("iters_per_logging", 50)

    # init params from one example batch
    example = next(iterate_batches(dataset, batch_size, shuffle=False))
    x0 = jnp.asarray(example["complete"])
    condition = (
        jnp.asarray(example["partial"])
        if train_config.get("conditioned_on_cloud", True)
        else None
    )
    label = jnp.asarray(example["label"])
    if task == "refine_completion":
        net_in = jnp.asarray(example.get("generated", example["complete"]))
        ts0 = None
    else:
        net_in = x0
        ts0 = jnp.zeros((x0.shape[0],), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), net_in, condition, ts0, label)

    record_stats = bool(
        pointnet_config.get("record_neighbor_stats", False)
        and pointnet_config.get("network_type", "pointnet++") == "pointnet++"
    )
    stats_acc = None
    if record_stats and condition is not None:
        # one-shot architecture report on the first batch (radii tuning aid)
        from ..utils.neighbor_stats import (
            NeighborStatsAccumulator,
            model_neighbor_stats,
        )

        model_neighbor_stats(pointnet_config, net_in, condition)
        # per-forward accumulation across training (the reference records
        # counts inside every forward, pointnet2_utils.py:423-428; here the
        # modules sow exact count histograms and this accumulator merges
        # them across steps, reported at every checkpoint)
        stats_acc = NeighborStatsAccumulator()

    state, tx = create_train_state(
        params, jax.random.key(rank + 1), train_config.get("learning_rate", 2e-4)
    )

    # resume
    restored, ckpt_iter, prev_secs = maybe_resume(
        output_directory, train_config.get("ckpt_iter", "max"), state
    )
    if restored is not None:
        state = restored
    n_iter = ckpt_iter + 1
    time0 = time.time() - prev_secs

    scale = trainset_config.get("scale", 1)
    record_stats = record_stats and stats_acc is not None
    if task == "completion":
        step_fn = make_completion_train_step(
            model, schedule, tx, record_stats=record_stats
        )
        n_batch_args = 3
    else:
        step_fn = make_refine_train_step(
            model,
            tx,
            scale=scale,
            cd_loss_type=refine_config.get("cd_loss_type", "cd_t"),
            point_upsample_factor=pointnet_config.get("point_upsample_factor", 1),
            include_displacement_center=pointnet_config.get(
                "include_displacement_center_to_final_output", False
            ),
            intermediate_loss_weight=pointnet_config.get(
                "intermediate_refined_X_loss_weight", 0.0
            )
            if pointnet_config.get("point_upsample_factor", 1) > 1
            else 0.0,
            task=task,
            record_stats=record_stats,
        )
        n_batch_args = 4

    if mesh is None:
        mesh = make_mesh()
    jitted, state = jit_step_for_mesh(
        step_fn, mesh, state, n_array_args=n_batch_args,
        n_scalar_args=0 if task == "completion" else 1,
        n_extra_outputs=1 if record_stats else 0,
    )

    osf_scheduler = None
    output_scale_factor = refine_config.get("output_scale_factor", 0.001)
    if task == "refine_completion":
        if refine_config.get("use_output_scale_factor_schedule", False):
            s = refine_config["output_scale_factor_schedule"]
            osf_scheduler = QuantityScheduler(
                s["init_epoch"], s["final_epoch"], s["init_value"],
                refine_config["output_scale_factor"], loader_len,
            )

    # ---- eval-in-loop setup (train.py:568-631) --------------------------
    eval_per_ckpt = int(train_config.get("eval_per_ckpt", 1))
    eval_start_iter = train_config.get("eval_start_epoch", 0) * loader_len - 1
    num_samples_tested = trainset_config.get("num_samples_tested", 0)
    compute_emd = bool(train_config.get("compute_emd", True))
    only_best = bool(train_config.get("only_save_the_best_model", False))
    if task == "completion" and only_best:
        raise ValueError(
            "To train the diffusion model, we should save every checkpoint"
        )
    eval_dir = os.path.join(root, local_path, "eval_result")
    eval_T = int(train_config.get("eval_sampling_steps", 0))  # 0 = full T

    test_trainset_during_eval = bool(
        trainset_config.get("test_trainset_during_eval", False)
    )

    def run_eval(n_iter_now, osf_now):
        """Evaluate the test split (and optionally the train split) at a
        checkpoint: per-rank metric pickles with the reference's naming
        (train.py:76-90), a collective gather replacing the rank-0 pickle
        merge (train.py:128-257), and a broadcast of the gathered test CD so
        every rank takes identical best-ckpt / threshold decisions
        (train.py:599-631)."""
        import pickle

        from ..cli.eval_results import gather_eval_results, save_eval_result
        from ..data import iterate_batches
        from ..parallel.mesh import pad_batch_rows
        from ..parallel.multihost import all_gather_host_arrays, broadcast_scalar

        data_par = int(mesh.shape["data"])
        bs = trainset_config.get("eval_batch_size", 32)
        if task == "completion":
            sampler, _ = make_eval_sampler(
                model, schedule, diffusion_config,
                num_points=trainset_config.get("npoints", 2048),
                eval_T=eval_T, mesh=mesh,
            )
            rng_holder = [jax.random.key(4242 + n_iter_now)]

            def gen_fn(batch):
                rng_holder[0], k = jax.random.split(rng_holder[0])
                B = batch["partial"].shape[0]
                cond = pad_batch_rows(batch["partial"], data_par)
                lab = pad_batch_rows(batch["label"], data_par)
                return sampler(
                    state.params, k, jnp.asarray(cond), jnp.asarray(lab)
                )[:B]
        else:
            refiner = jax.jit(
                make_refiner(
                    model,
                    point_upsample_factor=pointnet_config.get("point_upsample_factor", 1),
                    include_displacement_center=pointnet_config.get(
                        "include_displacement_center_to_final_output", False
                    ),
                )
            )

            def gen_fn(batch):
                B = batch["partial"].shape[0]
                args = shard_batch(
                    (
                        jnp.asarray(pad_batch_rows(
                            batch.get("generated", batch["complete"]), data_par
                        )),
                        jnp.asarray(pad_batch_rows(batch["partial"], data_par)),
                        jnp.asarray(pad_batch_rows(batch["label"], data_par)),
                    ),
                    mesh,
                )
                return refiner(state.params, *args, jnp.float32(osf_now))[:B]

        def eval_split(split_phase, tag):
            # the reference tests num_samples_tested total, split across
            # ranks (train.py:54-55, 95-97)
            n_sub = max(1, num_samples_tested // world)
            override = (
                eval_dataset_override
                if split_phase == "test"
                else trainset_eval_dataset_override
            )
            if override is not None:
                eval_ds = override
            else:
                eval_ds = make_dataset(
                    trainset_config, split_phase, rank, world, eval_subset=n_sub
                )
            res = evaluate(
                gen_fn, iterate_batches(eval_ds, bs, shuffle=False), scale=scale,
                compute_emd=compute_emd, print_every=10 ** 9,
            )
            os.makedirs(eval_dir, exist_ok=True)
            rank_file = os.path.join(
                eval_dir, f"eval_result_ckpt_{n_iter_now}_rank_{rank}{tag}.pkl"
            )
            with open(rank_file, "wb") as f:
                pickle.dump(
                    {
                        "avg_cd": res.avg_cd,
                        "avg_emd": res.avg_emd,
                        **{k: np.asarray(v) for k, v in res.metrics.items()},
                    },
                    f,
                )
            metrics = res.metrics
            if world > 1:
                metrics = {k: all_gather_host_arrays(v) for k, v in metrics.items()}
            avg_cd = float(np.mean(metrics["cd_distance"]))
            avg_emd = float(np.mean(metrics["emd_distance"]))
            return avg_cd, avg_emd, metrics

        avg_cd, avg_emd, metrics = eval_split("test", "")
        tb.add_scalar("CD-Loss", avg_cd, n_iter_now)
        tb.add_scalar("EMD-Loss", avg_emd, n_iter_now)
        if rank == 0:
            save_eval_result(eval_dir, n_iter_now, avg_cd, avg_emd, metrics)
            gather_eval_results(eval_dir)
        if test_trainset_during_eval:
            tr_cd, tr_emd, _ = eval_split("test_trainset", "_trainset")
            tb.add_scalar("Trainset CD-Loss", tr_cd, n_iter_now)
            tb.add_scalar("Trainset EMD-Loss", tr_emd, n_iter_now)
            print(
                f"eval @ iter {n_iter_now}: Trainset CD {tr_cd:.8f} "
                f"EMD {tr_emd:.8f}",
                flush=True,
            )
        # rank 0's gathered value is authoritative (train.py:623)
        avg_cd = broadcast_scalar(avg_cd)
        print(
            f"eval @ iter {n_iter_now}: CD {avg_cd:.8f} EMD {avg_emd:.8f}",
            flush=True,
        )
        return avg_cd, avg_emd

    loss_meter = AverageMeter("Train-Loss")
    eval_records = {"iter": [], "avg_cd": [], "avg_emd": []}
    best_cd = None
    last_saved = None
    last_saved_best = None
    num_ckpts = 0

    done = False
    while not done:
        if trainset_config.get("randomly_select_generated_samples", False):
            dataset = dataset_override or make_dataset(trainset_config, True, rank, world)
        for batch in iterate_batches(dataset, batch_size, shuffle=True, drop_last=True):
            x0 = jnp.asarray(batch["complete"])
            condition = jnp.asarray(batch["partial"])
            label = jnp.asarray(batch["label"])
            if task == "completion":
                args = shard_batch((x0, condition, label), mesh)
                out = jitted(state, *args)
            else:
                generated = jnp.asarray(batch.get("generated", batch["complete"]))
                osf = (
                    osf_scheduler.get_quantity(n_iter)
                    if osf_scheduler is not None
                    else output_scale_factor
                )
                args = shard_batch((x0, condition, label, generated), mesh)
                out = jitted(state, *args, jnp.float32(osf))
            if record_stats:
                state, loss, step_stats = out
                stats_acc.update(step_stats)
            else:
                state, loss = out
            loss_val = float(loss)
            loss_meter.update(loss_val)

            if n_iter % iters_per_logging == 0:
                print(f"iteration: {n_iter} \tloss: {loss_val:.6f}", flush=True)
                tb.add_scalar("Log-Train-Loss", float(np.log(max(loss_val, 1e-12))), n_iter)

            if n_iter > 0 and (n_iter + 1) % iters_per_ckpt == 0:
                num_ckpts += 1
                if rank == 0:
                    if last_saved is not None and only_best:
                        import shutil

                        shutil.rmtree(last_saved, ignore_errors=True)
                    last_saved = save_checkpoint(
                        output_directory, n_iter, state,
                        training_time_seconds=time.time() - time0,
                    )
                    print(f"checkpoint saved at iteration {n_iter}", flush=True)
                    if stats_acc is not None and stats_acc.forwards:
                        stats_acc.report()

                if (
                    num_samples_tested > 0
                    and n_iter >= eval_start_iter
                    and num_ckpts % eval_per_ckpt == 0
                ):
                    osf_now = (
                        osf_scheduler.get_quantity(n_iter)
                        if osf_scheduler is not None
                        else output_scale_factor
                    )
                    avg_cd, avg_emd = run_eval(n_iter, osf_now)
                    eval_records["iter"].append(n_iter)
                    eval_records["avg_cd"].append(avg_cd)
                    eval_records["avg_emd"].append(avg_emd)
                    if only_best and rank == 0:
                        if best_cd is None or avg_cd <= best_cd:
                            if last_saved_best is not None:
                                import shutil

                                shutil.rmtree(last_saved_best, ignore_errors=True)
                            best_cd = avg_cd
                            best_dir = os.path.join(
                                output_directory, f"pointnet_ckpt_{n_iter}_best_cd"
                            )
                            import shutil

                            shutil.copytree(last_saved, best_dir)
                            last_saved_best = best_dir
                    # close-to-convergence: save/eval more often
                    # (train.py:626-631)
                    if (
                        task == "refine_completion"
                        and refine_config.get(
                            "decrease_epochs_per_ckpt_for_fine_tuning", False
                        )
                        and avg_cd <= refine_config.get("cd_loss_thred", 0.0)
                    ):
                        iters_per_ckpt = int(
                            loader_len * refine_config["epochs_per_ckpt_fine_tune"]
                        )

            n_iter += 1
            if n_iter >= n_iters:
                done = True
                break
        if loader_len == 0:
            break

    if rank == 0:
        save_checkpoint(
            output_directory, n_iter, state,
            training_time_seconds=time.time() - time0,
        )
    tb.close()
    return {
        "state": state,
        "model": model,
        "schedule": schedule,
        "output_directory": output_directory,
        "final_loss": loss_meter.avg,
        "n_iter": n_iter,
        "eval_records": eval_records,
        "best_cd": best_cd,
        "neighbor_stats": stats_acc,
    }


def train_from_file(config_path: str, **kw):
    return train(load_config(config_path), **kw)
