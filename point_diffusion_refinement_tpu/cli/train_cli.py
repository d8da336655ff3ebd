"""Training CLI.

Reference: `python distributed.py --config <cfg.json>` (distributed.py) +
`python train.py --config ... --rank i` (train.py:641-714).  There is no
subprocess fan-out: one process drives every local chip via SPMD, so the
launcher and the worker collapse into this single command:

    python -m point_diffusion_refinement_tpu.cli.train_cli --config cfg.json
"""

from __future__ import annotations

import argparse

from ..config.loader import load_config
from ..train.loop import train


def main(argv=None):
    p = argparse.ArgumentParser(description="Train PDR (DDPM or refinement)")
    p.add_argument("-c", "--config", required=True, help="JSON config path")
    p.add_argument("--max_steps", type=int, default=None,
                   help="truncate training (smoke runs)")
    args = p.parse_args(argv)
    config = load_config(args.config)
    result = train(config, max_steps=args.max_steps)
    print(f"training finished at iteration {result['n_iter']}, "
          f"avg loss {result['final_loss']:.6f}")
    return result


if __name__ == "__main__":
    main()
