"""Generation CLI.

Reference: `python generate_samples_distributed.py --execute
--gather_results ...` (per-GPU subprocesses + filesystem merge) and
generate_samples.py.  One SPMD process replaces the fan-out; `--num_trials`
reproduces the 10-trial augmented trainset generation used to build the
refinement training set (generate_samples.py:459-485).
"""

from __future__ import annotations

import argparse

from ..config.loader import load_config
from ..sample.pipeline import run_generation


def main(argv=None):
    p = argparse.ArgumentParser(description="Generate coarse completions")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--phase", default="test", choices=["test", "test_trainset"])
    p.add_argument("--ckpt_iter", default="max")
    p.add_argument("--num_trials", type=int, default=1)
    p.add_argument("--fast_sampling", action="store_true")
    p.add_argument("--fast_sampling_length", type=int, default=50)
    p.add_argument("--fast_sampling_method", default="var", choices=["var", "step"])
    p.add_argument("--fast_sampling_schedule", default="quadratic",
                   choices=["linear", "quadratic"])
    p.add_argument("--fast_sampling_kappa", type=float, default=0.5)
    p.add_argument("--augment_data_during_generation", action="store_true")
    p.add_argument("--num_samples_tested", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--no_save", action="store_true")
    p.add_argument("--no_emd", action="store_true")
    # XT warm start (generate_samples.py:312-315,374-376): resume the reverse
    # process from a precomputed noisy slice x_{T_step} instead of x_T
    p.add_argument("--use_a_precomputed_XT", action="store_true")
    p.add_argument("--T_step", type=int, default=100)
    p.add_argument("--XT_folder", default=None)
    args = p.parse_args(argv)

    config = load_config(args.config)
    fs_cfg = None
    if args.fast_sampling:
        fs_cfg = {
            "length": args.fast_sampling_length,
            "sampling_method": args.fast_sampling_method,
            "schedule": args.fast_sampling_schedule,
            "kappa": args.fast_sampling_kappa,
        }
    return run_generation(
        config,
        phase=args.phase,
        ckpt_iter=args.ckpt_iter,
        fast_sampling=args.fast_sampling,
        fast_sampling_config=fs_cfg,
        num_trials=args.num_trials,
        augment_data_during_generation=args.augment_data_during_generation,
        num_samples_tested=args.num_samples_tested,
        save_generated=not args.no_save,
        batch_size=args.batch_size,
        compute_emd=not args.no_emd,
        use_a_precomputed_XT=args.use_a_precomputed_XT,
        T_step=args.T_step,
        XT_folder=args.XT_folder,
    )


if __name__ == "__main__":
    main()
