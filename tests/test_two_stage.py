"""Two-stage pipeline integration: DDPM training -> multi-trial coarse
generation -> refinement training on the generated samples (+ upsample x2)
-> refined evaluation, all through the config-driven drivers.

This is the reference README's full workflow (train.py:442-522,
generate_samples.py:459-485, mvp_dataset.py:105-127): the refinement net is
trained on `include_generated_samples` data with
`randomly_select_generated_samples` picking among trial_* directories, and
its eval path refines the DDPM's coarse test-set generations.
"""

import copy
import glob
import os
import random

import numpy as np
import pytest

from point_diffusion_refinement_tpu.config import tiny_pointnet_config
from point_diffusion_refinement_tpu.data import write_mvp_style_h5
from point_diffusion_refinement_tpu.data.mvp import MVPDataset, MVPDatasetConfig
from point_diffusion_refinement_tpu.sample.pipeline import run_generation
from point_diffusion_refinement_tpu.train.loop import local_experiment_path, train

NPOINTS = 48  # coarse resolution (DDPM + generated samples)
NPOINTS_UP = 96  # refine target resolution (upsample x2)
PARTIAL = 32


def _ddpm_config(data_dir: str, root: str) -> dict:
    return {
        "diffusion_config": {"T": 8, "beta_0": 1e-4, "beta_T": 0.02},
        "pointnet_config": tiny_pointnet_config(),
        "train_config": {
            "task": "completion",
            "root_directory": root,
            "output_directory": "logs/checkpoint",
            "ckpt_iter": "max",
            "epochs_per_ckpt": 100,
            "iters_per_logging": 50,
            "n_epochs": 2,
            "learning_rate": 2e-4,
            "conditioned_on_cloud": True,
            "compute_emd": False,
        },
        "mvp_dataset_config": {
            "data_dir": data_dir,
            "npoints": NPOINTS,
            "novel_input": False,
            "scale": 1,
            "batch_size": 16,
            "eval_batch_size": 13,
            "num_samples_tested": 0,
            "augmentation": {
                "pc_augm_scale": 1.05,
                "pc_augm_rot": True,
                "pc_rot_scale": 10.0,
                "pc_augm_mirror_prob": 0.5,
                "pc_augm_jitter": False,
                "translation_magnitude": 0.01,
            },
        },
        "gen_config": {"ckpt_path": "logs/checkpoint"},
    }


def _refine_config(ddpm_cfg: dict, generated_sample_path: str) -> dict:
    cfg = copy.deepcopy(ddpm_cfg)
    pc = cfg["pointnet_config"]
    pc["include_t"] = False
    pc["point_upsample_factor"] = 2
    pc["include_displacement_center_to_final_output"] = False
    pc["intermediate_refined_X_loss_weight"] = 0
    tc = cfg["train_config"]
    tc["task"] = "refine_completion"
    tc["n_epochs"] = 2
    tc["epochs_per_ckpt"] = 1
    mc = cfg["mvp_dataset_config"]
    mc["npoints"] = NPOINTS_UP
    mc["include_generated_samples"] = True
    mc["generated_sample_path"] = generated_sample_path
    mc["randomly_select_generated_samples"] = True
    mc["num_samples_tested"] = 8
    mc["augmentation"] = {
        "pc_augm_scale": 1.01,
        "pc_augm_rot": True,
        "pc_rot_scale": 3.0,
        "pc_augm_mirror_prob": 0.5,
        "pc_augm_jitter": False,
        "translation_magnitude": 0.005,
        "noise_magnitude_for_generated_samples": 0.01,
    }
    cfg["refine_config"] = {
        "exp_name": "two_stage_test",
        "cd_loss_type": "cd_t",
        "output_scale_factor": 0.001,
        "cd_loss_thred": 0.0,
    }
    return cfg


@pytest.fixture(scope="module")
def two_stage(tmp_path_factory):
    base = tmp_path_factory.mktemp("two_stage")
    data_dir = str(base / "mvp")
    root = str(base / "exp")
    # coarse-resolution GT first, then the upsample-target GT (the second
    # call also rewrites the partials; shapes are parametric so the pairing
    # stays consistent)
    write_mvp_style_h5(
        data_dir, num_shapes=2, npoints=NPOINTS, partial_points=PARTIAL
    )
    write_mvp_style_h5(
        data_dir, num_shapes=2, npoints=NPOINTS_UP, partial_points=PARTIAL
    )

    cfg = _ddpm_config(data_dir, root)
    result = train(cfg, max_steps=4)
    it = result["n_iter"]

    gen_kw = dict(
        save_generated=True, compute_emd=False, batch_size=13,
        segment_size=None,
    )
    # coarse test-set generation (refine eval consumes it)
    run_generation(cfg, phase="test", num_trials=1, **gen_kw)
    # trainset generation: bare dir + 2 augmented trials
    run_generation(
        cfg, phase="test_trainset", num_trials=1,
        augment_data_during_generation=True, **gen_kw,
    )
    run_generation(
        cfg, phase="test_trainset", num_trials=2,
        augment_data_during_generation=True, **gen_kw,
    )
    gen_rel = os.path.join(
        "generated_samples", local_experiment_path(cfg), f"ckpt_{it}"
    )
    return cfg, data_dir, root, it, gen_rel


class TestTwoStage:
    def test_generation_taxonomy_on_disk(self, two_stage):
        _, data_dir, _, it, gen_rel = two_stage
        gen_dir = os.path.join(data_dir, gen_rel)
        for sub in ("test", "train", "trial_1/train", "trial_2/train"):
            h5s = glob.glob(
                os.path.join(gen_dir, sub, "mvp_generated_data_*pts.h5")
            )
            assert len(h5s) == 1, (sub, h5s)
            assert os.path.exists(
                os.path.join(gen_dir, sub, "eval_result.pkl")
            )

    def test_dataset_trial_selection_and_shapes(self, two_stage):
        """randomly_select_generated_samples picks among the bare dir and the
        trial_* dirs (mvp_dataset.py:105-127) and pairs each partial with its
        generated coarse cloud."""
        _, data_dir, _, _, gen_rel = two_stage
        random.seed(0)
        seen = set()
        for _ in range(8):
            ds = MVPDataset(
                MVPDatasetConfig(
                    data_dir=data_dir,
                    train=True,
                    npoints=NPOINTS_UP,
                    novel_input=False,
                    include_generated_samples=True,
                    generated_sample_path=gen_rel,
                    randomly_select_generated_samples=True,
                )
            )
            assert ds.generated_sample is not None
            assert ds.generated_sample.shape[1] == NPOINTS
            seen.add(ds.generated_sample.tobytes())
        # bare dir vs augmented trials hold different clouds; the random
        # choice must reach more than one of them across 8 draws
        assert len(seen) >= 2
        item = ds[0]
        assert item["generated"].shape == (NPOINTS, 3)
        assert item["complete"].shape == (NPOINTS_UP, 3)

    def test_refine_training_and_eval(self, two_stage):
        cfg, data_dir, root, it, gen_rel = two_stage
        rcfg = _refine_config(cfg, gen_rel)
        result = train(rcfg, max_steps=3)
        assert np.isfinite(result["final_loss"])
        # refine loss is a CD between upsampled 96-pt refinement and 96-pt GT
        # of shapes in [-1,1]: must be small-ish even untrained (displacement
        # is scaled by output_scale_factor)
        assert result["final_loss"] < 10.0
        # eval-in-loop ran on the test split: it refined the DDPM's coarse
        # test generations and recorded CD at the upsampled resolution
        assert len(result["eval_records"]["iter"]) >= 1
        assert np.isfinite(result["eval_records"]["avg_cd"][0])
        out_dir = result["output_directory"]
        assert glob.glob(os.path.join(out_dir, "pointnet_ckpt_*"))
        # refine experiment dir is namespaced under refine_exp_*
        assert "refine_exp_two_stage_test" in out_dir
