"""Generation pipeline driver: checkpoint discovery, save-dir taxonomy,
multi-trial augmented generation.

Reference: pointnet2/generate_samples.py:52-267 (single process) +
generate_samples_distributed.py (per-GPU subprocess fan-out + filesystem
gather).  Here one process drives all chips; with multiple hosts, each host
generates its dataset shard and results are gathered with
`multihost_utils.process_allgather` — no per-rank h5 merging, no grepping a
log file to discover the output directory
(generate_samples_distributed.py:205-234).
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.loader import load_config
from ..diffusion import calc_diffusion_hyperparams, make_fast_sampling_plan
from ..parallel.mesh import pad_batch_rows
from ..parallel.multihost import all_gather_host_arrays, barrier
from ..train.checkpoints import find_max_epoch, maybe_resume
from .evaluate import evaluate
from .generate import make_coarse_sampler


def generation_save_dir(
    config: dict,
    ckpt_iter: int,
    *,
    fast_sampling: bool = False,
    fast_sampling_config: Optional[dict] = None,
    trial_index: Optional[int] = None,
    phase: str = "test",
    base_dir: Optional[str] = None,
) -> str:
    """Reproduce the generate_samples.py:98-160 directory taxonomy:
    <data>/generated_samples/<local_path>/ckpt_<it>[/fast_sampling/<cfg>]
    [/trial_<i>]/<train|test>."""
    from ..train.loop import local_experiment_path  # deferred: circular

    ts = config.get("mvp_dataset_config", {})
    base = base_dir or os.path.join(ts.get("data_dir", "data"), "generated_samples")
    save_dir = os.path.join(base, local_experiment_path(config), f"ckpt_{ckpt_iter}")
    if fast_sampling:
        cfg = fast_sampling_config or {}
        tag = "fast_sampling_config" + "".join(
            f"_{k}_{v}" for k, v in cfg.items()
        )
        save_dir = os.path.join(save_dir, "fast_sampling", tag)
    if trial_index is not None:
        save_dir = os.path.join(save_dir, f"trial_{trial_index}")
    sub = {"test": "test", "test_trainset": "train"}[phase]
    return os.path.join(save_dir, sub)


def run_generation(
    config: dict,
    *,
    phase: str = "test",
    ckpt_iter="max",
    fast_sampling: bool = False,
    fast_sampling_config: Optional[dict] = None,
    num_trials: int = 1,
    augment_data_during_generation: bool = False,
    num_samples_tested: Optional[int] = None,
    save_generated: bool = True,
    state_override=None,
    dataset_override=None,
    base_save_dir: Optional[str] = None,
    batch_size: Optional[int] = None,
    t_slices=None,
    compute_emd: bool = True,
    use_a_precomputed_XT: bool = False,
    T_step: int = 100,
    XT_folder: Optional[str] = None,
    segment_size: Optional[int] = 200,
    mesh=None,
):
    """Generate coarse clouds (+metrics) for a phase; loops trials for the
    augmented-trainset generation used to train the refinement network
    (generate_samples.py:459-485)."""
    # deferred: train.loop itself imports this package (sample) at top level
    from ..train.loop import build_model, local_experiment_path, make_dataset

    train_config = config["train_config"]
    pointnet_config = config["pointnet_config"]
    dc = config["diffusion_config"]
    ts_cfg = config.get("mvp_dataset_config", {})
    schedule = calc_diffusion_hyperparams(dc["T"], dc["beta_0"], dc["beta_T"])
    model = build_model(pointnet_config)
    # the reference's generation driver also serves the refinement task: one
    # net forward + point_upsample per batch instead of the reverse process
    # (generate_samples.py:419-457 -> completion_eval.py:159-168)
    task = train_config.get("task", "completion")
    refine_task = task == "refine_completion"
    output_scale_factor = config.get("refine_config", {}).get(
        "output_scale_factor", 0.001
    )

    # resolve checkpoint
    if state_override is not None:
        state, it = state_override, 0
    else:
        root = train_config.get("root_directory", "exp")
        # ckpt_path defaults to wherever training wrote checkpoints
        # (train_config.output_directory) so any config that trains can
        # generate; gen_config.ckpt_path still overrides it
        # (generate_samples.py:87-99 has a single hard-coded default, but
        # here train and gen each had one and they could drift apart).
        gen_ckpt = config.get("gen_config", {}).get(
            "ckpt_path", train_config.get("output_directory", "logs/checkpoint")
        )
        ckpt_path = os.path.join(root, local_experiment_path(config), gen_ckpt)
        if ckpt_iter in ("max", "best"):
            it = find_max_epoch(ckpt_path, ckpt_iter)
        else:
            it = int(ckpt_iter)
        if it < 0:
            raise FileNotFoundError(f"no checkpoint under {ckpt_path}")
        state = None  # restored below once an example state pytree exists
        ckpt_dir = ckpt_path

    plan = None
    if fast_sampling:
        fs = dict(fast_sampling_config or {})
        plan = make_fast_sampling_plan(
            schedule, dc["T"], dc["beta_0"], dc["beta_T"],
            length=fs.get("length", 50),
            sampling_method=fs.get("sampling_method", "var"),
            noise_schedule=fs.get("schedule", "quadratic"),
            kappa=fs.get("kappa", 0.5),
        )

    rank = jax.process_index()
    world = jax.process_count()
    scale = ts_cfg.get("scale", 1)
    if mesh is None and len(jax.devices()) > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()
    data_par = int(mesh.shape["data"]) if mesh is not None else 1
    results = []
    for trial in range(num_trials):
        if dataset_override is not None:
            dataset = dataset_override
        else:
            ds_cfg = dict(ts_cfg)
            if augment_data_during_generation:
                # generate_samples.py:374-393: augment during trainset
                # generation and return M_inv/translation for undoing it
                ds_cfg["return_augmentation_params"] = True
                ds_cfg["augment_data_during_generation"] = True
            if use_a_precomputed_XT:
                # generate_samples.py:312-315: the dataset loads the
                # DDPM-generated XT h5 for warm-started generation
                ds_cfg["load_pre_computed_XT"] = True
                ds_cfg["T_step"] = T_step
                if XT_folder is not None:
                    ds_cfg["XT_folder"] = XT_folder
            dataset = make_dataset(
                ds_cfg, phase, rank, world, eval_subset=num_samples_tested
            )
        bs = batch_size or ts_cfg.get("eval_batch_size", 32)

        npoints = ts_cfg.get("npoints", 2048)
        if refine_task:
            from .generate import make_refiner

            refiner = jax.jit(
                make_refiner(
                    model,
                    point_upsample_factor=pointnet_config.get(
                        "point_upsample_factor", 1
                    ),
                    include_displacement_center=pointnet_config.get(
                        "include_displacement_center_to_final_output", False
                    ),
                )
            )
        else:
            # segment long ancestral schedules into bounded device
            # executions; FastDPM plans are short, keep them jitted whole
            seg = None if fast_sampling else segment_size
            sampler = make_coarse_sampler(
                model, schedule, num_points=npoints, fast_plan=plan,
                t_slices=t_slices,
                warm_start_step=T_step if use_a_precomputed_XT else None,
                segment_size=seg,
                mesh=mesh,
            )
            if seg is None:
                sampler = jax.jit(sampler)

        if state_override is None:
            # need an example state pytree: init params from one batch
            from ..data import iterate_batches

            ex = next(iterate_batches(dataset, 1, shuffle=False))
            # jit the init: eager init dispatches thousands of ops one RPC at
            # a time through the TPU tunnel (minutes); jitted it is one program
            net_in = jnp.asarray(
                ex.get("generated", ex["complete"]) if refine_task
                else ex["complete"]
            )
            params = jax.jit(model.init)(
                jax.random.key(0),
                net_in,
                jnp.asarray(ex["partial"]),
                None if refine_task else jnp.zeros((1,), jnp.float32),
                jnp.asarray(ex["label"]),
            )
            from ..train.step import create_train_state

            ex_state, _ = create_train_state(params, jax.random.key(0))
            state, _, _ = maybe_resume(ckpt_dir, it, ex_state)
            if state is None:
                raise FileNotFoundError(f"checkpoint {it} under {ckpt_dir}")

        params = state.params if hasattr(state, "params") else state
        if mesh is not None:
            from ..parallel.mesh import replicated

            params = jax.device_put(params, replicated(mesh))
        rng_holder = [jax.random.key(1000 + trial)]

        if refine_task:

            def gen_fn(batch):
                B = batch["partial"].shape[0]
                coarse = jnp.asarray(pad_batch_rows(
                    np.asarray(batch.get("generated", batch["complete"])),
                    data_par,
                ))
                cond = jnp.asarray(
                    pad_batch_rows(np.asarray(batch["partial"]), data_par)
                )
                lab = jnp.asarray(
                    pad_batch_rows(np.asarray(batch["label"]), data_par)
                )
                if mesh is not None:
                    from ..parallel.mesh import shard_batch

                    coarse, cond, lab = shard_batch((coarse, cond, lab), mesh)
                return refiner(
                    params, coarse, cond, lab, jnp.float32(output_scale_factor)
                )[:B]

        else:

            def gen_fn(batch):
                rng_holder[0], k = jax.random.split(rng_holder[0])
                B = batch["partial"].shape[0]
                cond = pad_batch_rows(np.asarray(batch["partial"]), data_par)
                label = pad_batch_rows(np.asarray(batch["label"]), data_par)
                XT = (
                    jnp.asarray(pad_batch_rows(np.asarray(batch["XT"]), data_par))
                    if use_a_precomputed_XT and "XT" in batch
                    else None
                )
                out = sampler(params, k, jnp.asarray(cond), jnp.asarray(label), XT)
                if isinstance(out, tuple):
                    x, slices = out
                    return x[:B], {t: v[:B] for t, v in slices.items()}
                return out[:B]

        from ..data import iterate_batches

        save_dir = None
        if save_generated:
            save_dir = generation_save_dir(
                config,
                it,
                fast_sampling=fast_sampling,
                fast_sampling_config=fast_sampling_config,
                trial_index=trial + 1 if num_trials > 1 else None,
                phase=phase,
                base_dir=base_save_dir,
            )
            if world > 1:
                save_dir = os.path.join(save_dir, f"rank_{rank}")
        res = evaluate(
            gen_fn,
            iterate_batches(dataset, bs, shuffle=False),
            scale=scale,
            save_generated_samples=save_generated,
            save_dir=save_dir,
            unaugment_results=augment_data_during_generation,
            compute_emd=compute_emd,
        )

        # per-rank pickle with this host's LOCAL shard metrics (the
        # reference's per-rank eval pkl, generate_samples.py:233-245)
        if save_generated and save_dir is not None:
            with open(os.path.join(save_dir, "eval_result.pkl"), "wb") as f:
                pickle.dump(
                    {
                        "avg_cd": res.avg_cd,
                        "avg_emd": res.avg_emd,
                        "metrics": res.metrics,
                        "labels": res.labels,
                    },
                    f,
                )

        # multi-host: every host holds metrics for its dataset shard only.
        # Gather them over the collectives (replacing the reference's
        # per-rank pickle merge, generate_samples_distributed.py:26-97) so
        # the averages below — and any best-ckpt decision made on them —
        # are global and identical on all hosts.
        if world > 1:
            res.metrics = {
                k: all_gather_host_arrays(v) for k, v in res.metrics.items()
            }
            res.labels = all_gather_host_arrays(res.labels)
            res.avg_cd = float(np.mean(res.metrics["cd_distance"]))
            res.avg_emd = float(np.mean(res.metrics["emd_distance"]))
            if save_generated and save_dir is not None:
                barrier("pdr_generation_trial")
                if rank == 0:
                    gather_generated_results(os.path.dirname(save_dir), world)

        results.append(res)
        print(
            f"trial {trial}: avg CD {res.avg_cd:.8f} avg EMD {res.avg_emd:.8f} "
            f"({res.total_generation_time:.1f}s generation)",
            flush=True,
        )
    return results


def gather_generated_results(
    parent_dir: str, world_size: int, delete_rank_dirs: bool = False
) -> Optional[str]:
    """Merge per-rank generation outputs `rank_{i}/*.h5` into `parent_dir`.

    Filesystem analogue of the reference's gather_generated_results
    (generate_samples_distributed.py:26-97), minus the grep-the-log
    directory discovery: h5 `data` arrays are concatenated rank-ascending
    (matching the dataset's static rank sharding order) and the per-rank
    eval pickles merged.  Used when hosts share a filesystem; metrics are
    additionally gathered over the collectives in `run_generation` so this
    is only needed for the clouds themselves.  Returns the merged h5 path
    (None if the rank dirs are absent, e.g. non-shared filesystems).
    """
    try:
        import h5py
    except ImportError:  # pragma: no cover
        return None
    rank_dirs = [os.path.join(parent_dir, f"rank_{i}") for i in range(world_size)]
    if not all(os.path.isdir(d) for d in rank_dirs):
        return None
    names = sorted(
        f for f in os.listdir(rank_dirs[0]) if f.endswith(".h5")
    )
    merged_path = None
    for name in names:
        chunks = []
        for d in rank_dirs:
            p = os.path.join(d, name)
            if not os.path.exists(p):
                return None
            with h5py.File(p, "r") as f:
                chunks.append(np.array(f["data"]))
        out = os.path.join(parent_dir, name)
        with h5py.File(out, "w") as f:
            f.create_dataset("data", data=np.concatenate(chunks, axis=0))
        merged_path = out
    pkls = [os.path.join(d, "eval_result.pkl") for d in rank_dirs]
    if all(os.path.exists(p) for p in pkls):
        payloads = []
        for p in pkls:
            with open(p, "rb") as f:
                payloads.append(pickle.load(f))
        metrics = {
            k: np.concatenate([pl["metrics"][k] for pl in payloads])
            for k in payloads[0]["metrics"]
        }
        merged = {
            "avg_cd": float(np.mean(metrics["cd_distance"])),
            "avg_emd": float(np.mean(metrics["emd_distance"])),
            "metrics": metrics,
            "labels": np.concatenate([pl["labels"] for pl in payloads]),
        }
        with open(os.path.join(parent_dir, "eval_result.pkl"), "wb") as f:
            pickle.dump(merged, f)
    if delete_rank_dirs:
        import shutil

        for d in rank_dirs:
            shutil.rmtree(d, ignore_errors=True)
    return merged_path


def run_generation_from_file(config_path: str, **kw):
    return run_generation(load_config(config_path), **kw)
