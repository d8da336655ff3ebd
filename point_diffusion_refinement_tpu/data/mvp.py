"""MVP completion dataset: h5 loading, sharding, batching.

Reference: pointnet2/mvp_dataloader/mvp_dataset.py (ShapeNetH5) and
pointnet2/dataset.py:21-77 (get_dataloader).  Key semantics preserved:
  * 26 partial views per GT shape; item i pairs partial[i] with gt[i // 26];
  * novel inputs appended (or mirrored 4-channel partials loaded instead);
  * optional DDPM-generated coarse clouds, with random trial_* directory
    selection per epoch (refinement training);
  * optional precomputed XT (warm-start generation);
  * static rank sharding over GT shapes with random resampling to pad the
    last rank;
  * random eval subsampling with the partial->gt index carried along;
  * coordinates scaled by 2 * scale.

The loader is numpy end-to-end and emits fixed-size host batches ready for
`jax.device_put` — no torch DataLoader worker processes; augmentation is
vectorized per batch.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from .augment import augment_cloud

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

VIEWS_PER_SHAPE = 26


def _find_h5(dir_path: str, canonical: str, pattern: str) -> str:
    """Resolve a generated-data h5: the reference hardcodes the 2048-pt name
    (mvp_dataset.py:105-127 — generation is always 2048 pts there); when
    generating at other resolutions the pipeline writes
    ``mvp_generated_data_{n}pts.h5``, so fall back to a unique glob match."""
    p = os.path.join(dir_path, canonical)
    if os.path.exists(p):
        return p
    import glob

    matches = sorted(glob.glob(os.path.join(dir_path, pattern)))
    if len(matches) == 1:
        return matches[0]
    raise FileNotFoundError(
        f"no {canonical} (or unique {pattern}) under {dir_path}; "
        f"found {matches}"
    )


@dataclass
class MVPDatasetConfig:
    data_dir: str
    train: bool = True
    npoints: int = 2048
    novel_input: bool = True
    novel_input_only: bool = False
    scale: float = 1.0
    rank: int = 0
    world_size: int = 1
    random_subsample: bool = False
    num_samples: int = 1000
    augmentation: Optional[dict] = None
    return_augmentation_params: bool = False
    include_generated_samples: bool = False
    generated_sample_path: Optional[str] = None
    randomly_select_generated_samples: bool = False
    use_mirrored_partial_input: bool = False
    number_partial_points: int = 2048
    load_pre_computed_XT: bool = False
    T_step: int = 100
    XT_folder: Optional[str] = None
    append_samples_to_last_rank: bool = True
    seed: Optional[int] = None


class MVPDataset:
    """In-memory MVP dataset with reference-compatible file layout."""

    def __init__(self, cfg: MVPDatasetConfig):
        if h5py is None:
            raise RuntimeError("h5py is required for MVPDataset")
        self.cfg = cfg
        self.rng = np.random.default_rng(cfg.seed)
        split = "train" if cfg.train else "test"
        d = cfg.data_dir

        with h5py.File(os.path.join(d, f"mvp_{split}_input.h5"), "r") as f:
            input_data = np.array(f["incomplete_pcds"])
            labels = np.array(f["labels"])
            novel_input = np.array(f["novel_incomplete_pcds"])
            novel_labels = np.array(f["novel_labels"])
        with h5py.File(
            os.path.join(d, f"mvp_{split}_gt_{cfg.npoints}pts.h5"), "r"
        ) as f:
            gt_data = np.array(f["complete_pcds"])
            novel_gt = np.array(f["novel_complete_pcds"])

        self.generated_XT = None
        if cfg.load_pre_computed_XT:
            xt_file = _find_h5(
                os.path.join(cfg.XT_folder, split),
                f"mvp_generated_data_2048pts_T{cfg.T_step}.h5",
                f"mvp_generated_data_*pts_T{cfg.T_step}.h5",
            )
            with h5py.File(xt_file, "r") as f:
                self.generated_XT = np.array(f["data"])

        self.generated_sample = None
        if cfg.include_generated_samples:
            gen_dir = os.path.join(d, cfg.generated_sample_path)
            if cfg.randomly_select_generated_samples:
                trials = [
                    os.path.join(gen_dir, f)
                    for f in os.listdir(gen_dir)
                    if f.startswith("trial")
                ]
                gen_dir = random.choice([gen_dir] + trials)
            gen_file = _find_h5(
                os.path.join(gen_dir, split),
                "mvp_generated_data_2048pts.h5",
                "mvp_generated_data_*pts.h5",
            )
            with h5py.File(gen_file, "r") as f:
                self.generated_sample = np.array(f["data"])

        if cfg.novel_input_only:
            input_data, gt_data, labels = novel_input, novel_gt, novel_labels
        elif cfg.novel_input:
            if cfg.use_mirrored_partial_input:
                mirrored = os.path.join(
                    d,
                    "mirror_and_concated_partial",
                    f"mvp_{split}_input_mirror_and_concat_"
                    f"{cfg.number_partial_points}pts.h5",
                )
                with h5py.File(mirrored, "r") as f:
                    input_data = np.array(f["data"])
            else:
                input_data = np.concatenate([input_data, novel_input], axis=0)
            gt_data = np.concatenate([gt_data, novel_gt], axis=0)
            labels = np.concatenate([labels, novel_labels], axis=0)

        # static rank sharding over GT shapes (mvp_dataset.py:149-210)
        if cfg.world_size > 1:
            n_gt = gt_data.shape[0]
            per = int(np.ceil(n_gt / cfg.world_size))
            start, end = cfg.rank * per, (cfg.rank + 1) * per
            supp = None
            if cfg.rank == cfg.world_size - 1 and cfg.append_samples_to_last_rank:
                missing = end - n_gt
                if missing > 0:
                    assert cfg.train
                    supp_gt_idx = np.array(
                        random.sample(range(n_gt), missing), dtype=np.int64
                    )
                    supp_partial_idx = (
                        supp_gt_idx[:, None] * VIEWS_PER_SHAPE
                        + np.arange(VIEWS_PER_SHAPE)[None, :]
                    ).reshape(-1)
                    supp = (supp_gt_idx, supp_partial_idx)
            sl_p = slice(start * VIEWS_PER_SHAPE, end * VIEWS_PER_SHAPE)
            if supp is not None:
                supp_gt_idx, supp_partial_idx = supp
                input_data = np.concatenate(
                    [input_data[sl_p], input_data[supp_partial_idx]], axis=0
                )
                labels = np.concatenate(
                    [labels[sl_p], labels[supp_partial_idx]], axis=0
                )
                gt_data = np.concatenate(
                    [gt_data[start:end], gt_data[supp_gt_idx]], axis=0
                )
                if self.generated_sample is not None:
                    self.generated_sample = np.concatenate(
                        [self.generated_sample[sl_p], self.generated_sample[supp_partial_idx]],
                        axis=0,
                    )
                if self.generated_XT is not None:
                    self.generated_XT = np.concatenate(
                        [self.generated_XT[sl_p], self.generated_XT[supp_partial_idx]],
                        axis=0,
                    )
            else:
                input_data = input_data[sl_p]
                labels = labels[sl_p]
                gt_data = gt_data[start:end]
                if self.generated_sample is not None:
                    self.generated_sample = self.generated_sample[sl_p]
                if self.generated_XT is not None:
                    self.generated_XT = self.generated_XT[sl_p]

        # map from partial index to gt index
        self.partial_to_gt = (
            np.arange(input_data.shape[0], dtype=np.int64) // VIEWS_PER_SHAPE
        )

        self.random_subsample = cfg.random_subsample
        if cfg.random_subsample and cfg.num_samples < input_data.shape[0]:
            idx = np.array(
                random.sample(range(input_data.shape[0]), cfg.num_samples)
            )
            input_data = input_data[idx]
            labels = labels[idx]
            self.partial_to_gt = self.partial_to_gt[idx]
            if self.generated_sample is not None:
                self.generated_sample = self.generated_sample[idx]
            if self.generated_XT is not None:
                self.generated_XT = self.generated_XT[idx]

        # scale: shapes in [-0.5, 0.5] -> [-scale, scale]
        s = 2.0 * cfg.scale
        input_data = input_data.astype(np.float32)
        if cfg.use_mirrored_partial_input and input_data.shape[-1] == 4:
            input_data[:, :, :3] *= s
        else:
            input_data *= s
        self.input_data = input_data
        self.gt_data = gt_data.astype(np.float32) * s
        if self.generated_sample is not None:
            self.generated_sample = self.generated_sample.astype(np.float32) * s
        if self.generated_XT is not None:
            self.generated_XT = self.generated_XT.astype(np.float32) * s
        self.labels = labels.astype(np.int64)

    def __len__(self):
        return self.input_data.shape[0]

    def __getitem__(self, index: int) -> dict:
        result = {
            "partial": self.input_data[index].copy(),
            "complete": self.gt_data[self.partial_to_gt[index]].copy(),
        }
        if self.generated_sample is not None:
            result["generated"] = self.generated_sample[index].copy()
        if self.generated_XT is not None:
            result["XT"] = self.generated_XT[index].copy()

        aug = self.cfg.augmentation
        if isinstance(aug, dict):
            clouds = list(result.values())
            if self.cfg.return_augmentation_params:
                clouds, params = augment_cloud(
                    clouds, aug, return_augmentation_params=True, rng=self.rng
                )
            else:
                clouds = augment_cloud(clouds, aug, rng=self.rng)
                params = None
            for k, v in zip(result.keys(), clouds):
                result[k] = v
            sigma = aug.get("noise_magnitude_for_generated_samples", 0)
            if "generated" in result and sigma > 0:
                result["generated"] = result["generated"] + self.rng.normal(
                    scale=sigma, size=result["generated"].shape
                ).astype(np.float32)
            if params is not None:
                result.update(params)
        result["label"] = self.labels[index]
        return result


def get_batch_fast(dataset: "MVPDataset", idx: np.ndarray) -> Optional[dict]:
    """Batched collation + augmentation through the native C++ kernels
    (data/native.py): one gather per array, one similarity pass per cloud
    set — replaces per-item numpy augmentation (the torch DataLoader worker
    hot path in the reference).  Returns None when the per-item path is
    required (jitter or generated-sample noise enabled)."""
    from .augment import sample_transforms
    from .native import apply_similarity, gather_rows

    aug = dataset.cfg.augmentation
    if isinstance(aug, dict) and (
        aug.get("pc_augm_jitter", False)
        or aug.get("noise_magnitude_for_generated_samples", 0) > 0
    ):
        return None

    idx = np.asarray(idx, np.int64)
    batch = {"partial": gather_rows(dataset.input_data, idx)}
    batch["complete"] = gather_rows(dataset.gt_data, dataset.partial_to_gt[idx])
    if dataset.generated_sample is not None:
        batch["generated"] = gather_rows(dataset.generated_sample, idx)
    if dataset.generated_XT is not None:
        batch["XT"] = gather_rows(dataset.generated_XT, idx)

    if isinstance(aug, dict):
        M, t, M_inv = sample_transforms(len(idx), aug, dataset.rng)
        for k in list(batch.keys()):
            batch[k] = apply_similarity(batch[k], M, t)
        if dataset.cfg.return_augmentation_params:
            batch["M_inv"] = M_inv
            batch["translation"] = t[:, None, :]
    elif dataset.cfg.return_augmentation_params:
        batch["M_inv"] = np.broadcast_to(np.eye(3, dtype=np.float32), (len(idx), 3, 3)).copy()
        batch["translation"] = np.zeros((len(idx), 1, 3), np.float32)
    batch["label"] = dataset.labels[idx]
    return batch


def iterate_batches(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    drop_last: bool = False,
    seed: Optional[int] = None,
) -> Iterator[dict]:
    """Fixed-size numpy batches; uses the native batched collation path when
    the dataset supports it, falling back to per-item assembly."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for i in range(0, n, batch_size):
        idx = order[i : i + batch_size]
        if drop_last and len(idx) < batch_size:
            return
        batch = None
        if isinstance(dataset, MVPDataset):
            batch = get_batch_fast(dataset, idx)
        if batch is None:
            items = [dataset[int(j)] for j in idx]
            batch = {
                k: np.stack([it[k] for it in items]) for k in items[0].keys()
            }
        yield batch
