"""Two-stage pipeline demo on the real chip, at the shipped model scale.

Closes the loop the reference README describes (train DDPM -> generate
coarse clouds for the test set and augmented train-set trials -> train the
refinement+upsample net on them -> show refined CD-t beating coarse CD-t),
on synthetic MVP-style data since the real MVP download is unavailable here:

  1. synthetic shapes -> mirror+FPS preprocessing (preprocess CLI path)
  2. DDPM training (full-scale dual-path net, T=100 schedule for demo speed)
  3. coarse generation: test set + 2 augmented train-set trials + bare dir
     (generate_samples.py:459-485 taxonomy)
  4. refinement training with include_generated_samples +
     randomly_select_generated_samples + point_upsample_factor=2
     (config_refine_and_upsample_4096_pts...json analogue)
  5. refined eval on the test set; report refined vs coarse CD-t

Usage: python tools/two_stage_demo.py [--steps_ddpm 600] [--steps_refine 300]
Writes a summary JSON + markdown to tools/demo_out/ (and prints it).
"""

from __future__ import annotations

import argparse
import copy
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps_ddpm", type=int, default=600)
    p.add_argument("--steps_refine", type=int, default=300)
    p.add_argument("--T", type=int, default=100)
    p.add_argument("--num_shapes", type=int, default=6)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--workdir", default="/tmp/pdr_two_stage_demo")
    args = p.parse_args()

    from point_diffusion_refinement_tpu.cli.preprocess_cli import main as preprocess
    from point_diffusion_refinement_tpu.config import DEFAULT_POINTNET_CONFIG
    from point_diffusion_refinement_tpu.data import write_mvp_style_h5
    from point_diffusion_refinement_tpu.sample.pipeline import run_generation
    from point_diffusion_refinement_tpu.train.loop import (
        local_experiment_path,
        train,
    )

    data_dir = os.path.join(args.workdir, "mvp")
    root = os.path.join(args.workdir, "exp")
    t0 = time.time()

    # ---- 1. synthetic data + mirrored-partial preprocessing --------------
    # coarse-resolution GT (2048) and upsample-target GT (4096); the second
    # call rewrites the partials — shapes are parametric, pairing stays
    # consistent.  Idempotent: skip files that already exist (tunnel compile
    # stalls make re-runs expensive).
    mirrored = os.path.join(
        data_dir, "mirror_and_concated_partial",
        "mvp_test_input_mirror_and_concat_3072pts.h5",
    )
    if not os.path.exists(mirrored):
        write_mvp_style_h5(data_dir, num_shapes=args.num_shapes, npoints=2048,
                           partial_points=2048)
        write_mvp_style_h5(data_dir, num_shapes=args.num_shapes, npoints=4096,
                           partial_points=2048)
        preprocess(["--data_dir", data_dir, "--num_points", "3072",
                    "--batch_size", "32"])
    print(f"[{time.time()-t0:.0f}s] data + mirror preprocessing done", flush=True)

    # ---- 2. DDPM training ------------------------------------------------
    ddpm_cfg = {
        "diffusion_config": {"T": args.T, "beta_0": 1e-4, "beta_T": 0.02},
        "pointnet_config": {
            **copy.deepcopy(dict(DEFAULT_POINTNET_CONFIG)),
            "compute_dtype": "bfloat16",
        },
        "train_config": {
            "task": "completion",
            "root_directory": root,
            "output_directory": "logs/checkpoint",
            "ckpt_iter": "max",
            "epochs_per_ckpt": 10 ** 6,  # demo: no mid-run eval
            "iters_per_logging": 50,
            "n_epochs": 10 ** 6,  # bounded by max_steps
            "learning_rate": 2e-4,
            "conditioned_on_cloud": True,
            "compute_emd": False,
        },
        "mvp_dataset_config": {
            "data_dir": data_dir,
            "npoints": 2048,
            "novel_input": True,
            "scale": 1,
            "batch_size": args.batch_size,
            "eval_batch_size": args.batch_size,
            "num_samples_tested": 0,
            "use_mirrored_partial_input": True,
            "number_partial_points": 3072,
            "augmentation": {
                "pc_augm_scale": 1.2,
                "pc_augm_rot": True,
                "pc_rot_scale": 90,
                "pc_augm_mirror_prob": 0.5,
                "pc_augm_jitter": False,
                "translation_magnitude": 0.1,
            },
        },
        "gen_config": {"ckpt_path": "logs/checkpoint"},
    }
    res = train(ddpm_cfg, max_steps=args.steps_ddpm)
    it = res["n_iter"]
    print(
        f"[{time.time()-t0:.0f}s] DDPM trained {args.steps_ddpm} steps, "
        f"final loss {res['final_loss']:.4f}, ckpt {it}",
        flush=True,
    )

    # ---- 3. coarse generation -------------------------------------------
    gen_kw = dict(save_generated=True, compute_emd=False,
                  batch_size=args.batch_size)
    test_res = run_generation(ddpm_cfg, phase="test", num_trials=1, **gen_kw)
    coarse_cd = test_res[0].avg_cd
    print(f"[{time.time()-t0:.0f}s] test-set coarse CD-t {coarse_cd:.6f}",
          flush=True)
    run_generation(ddpm_cfg, phase="test_trainset", num_trials=1,
                   augment_data_during_generation=True, **gen_kw)
    run_generation(ddpm_cfg, phase="test_trainset", num_trials=2,
                   augment_data_during_generation=True, **gen_kw)
    gen_rel = os.path.join(
        "generated_samples", local_experiment_path(ddpm_cfg), f"ckpt_{it}"
    )
    gen_dir = os.path.join(data_dir, gen_rel)
    subs = ("test", "train", "trial_1/train", "trial_2/train")
    assert all(
        glob.glob(os.path.join(gen_dir, s, "mvp_generated_data_*pts.h5"))
        for s in subs
    ), f"generation taxonomy incomplete under {gen_dir}"
    print(f"[{time.time()-t0:.0f}s] trainset trials generated -> {gen_rel}",
          flush=True)

    # ---- 4. refinement (+ upsample x2) training -------------------------
    refine_cfg = copy.deepcopy(ddpm_cfg)
    pc = refine_cfg["pointnet_config"]
    pc["include_t"] = False
    pc["point_upsample_factor"] = 2
    pc["include_displacement_center_to_final_output"] = False
    pc["intermediate_refined_X_loss_weight"] = 0
    tc = refine_cfg["train_config"]
    tc["task"] = "refine_completion"
    mc = refine_cfg["mvp_dataset_config"]
    mc["npoints"] = 4096
    mc["include_generated_samples"] = True
    mc["generated_sample_path"] = gen_rel
    mc["randomly_select_generated_samples"] = True
    mc["augmentation"] = {
        "pc_augm_scale": 1.01,
        "pc_augm_rot": True,
        "pc_rot_scale": 3.0,
        "pc_augm_mirror_prob": 0.5,
        "pc_augm_jitter": False,
        "translation_magnitude": 0.005,
        "noise_magnitude_for_generated_samples": 0.01,
    }
    refine_cfg["refine_config"] = {
        "exp_name": "two_stage_demo",
        "cd_loss_type": "cd_t",
        "output_scale_factor": 0.001,
        "use_output_scale_factor_schedule": False,
        "cd_loss_thred": 0.0,
    }
    rres = train(refine_cfg, max_steps=args.steps_refine)
    print(
        f"[{time.time()-t0:.0f}s] refine net trained {args.steps_refine} "
        f"steps, final CD loss {rres['final_loss']:.6f}",
        flush=True,
    )

    # ---- 5. refined eval on the test set --------------------------------
    ref_res = run_generation(
        refine_cfg, phase="test", num_trials=1, save_generated=False,
        compute_emd=False, batch_size=args.batch_size,
    )
    refined_cd = ref_res[0].avg_cd

    summary = {
        "steps_ddpm": args.steps_ddpm,
        "steps_refine": args.steps_refine,
        "T": args.T,
        "ddpm_final_loss": res["final_loss"],
        "coarse_cd_t_2048": coarse_cd,
        "refined_cd_t_4096": refined_cd,
        "refined_beats_coarse": bool(refined_cd < coarse_cd),
        "total_wall_s": round(time.time() - t0, 1),
        "devices": str([str(d) for d in __import__("jax").devices()]),
    }
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "demo_out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "two_stage_demo.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2), flush=True)
    if not summary["refined_beats_coarse"]:
        print("WARNING: refinement did not improve CD; train longer", flush=True)


if __name__ == "__main__":
    main()
