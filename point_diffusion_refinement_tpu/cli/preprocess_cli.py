"""Mirror-and-concat preprocessing of MVP partial clouds.

Reference: mvp_dataloader/generate_mirrored_partial.py — reflect each
partial across the xy-plane, tag original/mirrored with a +/-1 channel, and
FPS-downsample the 2N points to the target counts (2048, 3072), writing
`mirror_and_concated_partial/mvp_{split}_input_mirror_and_concat_{n}pts.h5`.
The FPS runs on-device in jitted batches (data/mirror.py).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..data.mirror import generate_mirrored_partials


def main(argv=None):
    import h5py

    p = argparse.ArgumentParser(description="Generate mirrored partial clouds")
    p.add_argument("--data_dir", required=True, help="MVP dataset directory")
    p.add_argument("--splits", nargs="+", default=["train", "test"])
    p.add_argument("--num_points", type=int, nargs="+", default=[2048, 3072])
    p.add_argument("--batch_size", type=int, default=64)
    args = p.parse_args(argv)

    out_dir = os.path.join(args.data_dir, "mirror_and_concated_partial")
    os.makedirs(out_dir, exist_ok=True)
    for split in args.splits:
        with h5py.File(os.path.join(args.data_dir, f"mvp_{split}_input.h5"), "r") as f:
            partials = np.concatenate(
                [np.array(f["incomplete_pcds"]), np.array(f["novel_incomplete_pcds"])],
                axis=0,
            ).astype(np.float32)
        for n in args.num_points:
            mirrored = generate_mirrored_partials(
                partials, n, batch_size=args.batch_size
            )
            out = os.path.join(
                out_dir, f"mvp_{split}_input_mirror_and_concat_{n}pts.h5"
            )
            with h5py.File(out, "w") as f:
                f.create_dataset("data", data=mirrored)
            print(f"wrote {out} {mirrored.shape}")


if __name__ == "__main__":
    main()
