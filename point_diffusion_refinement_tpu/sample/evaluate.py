"""The shared inference/evaluation loop.

Reference: completion_eval.py:67-330 (evaluate): per batch — generate
(ancestral / FastDPM / warm-start, or one refine forward), un-augment,
normalize /2/scale, compute CD-t, CD-p, F1, EMD, accumulate per-sample
metrics, optionally append every generated cloud to an h5.

TPU design: sampling + un-augmentation + metrics are a single jitted program
per batch; the T reverse steps are a scan (no per-step Python).  Multi-host
generation shards the batch over the mesh instead of spawning per-GPU
subprocesses that merge results through the filesystem
(generate_samples_distributed.py:26-97).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.chamfer import calc_cd
from ..ops.emd import earth_mover_distance
from ..utils.meters import AverageMeter
from .generate import unaugment

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


@dataclass
class EvalResult:
    avg_cd: float
    avg_emd: float
    labels: np.ndarray
    metrics: dict  # cd_distance, emd_distance, cd_p, f1 — per-sample arrays
    total_generation_time: float = 0.0
    generated: Optional[np.ndarray] = None
    t_slices: Optional[dict] = None


def evaluate(
    generate_fn: Callable,
    batches: Iterable[dict],
    *,
    scale: float = 1.0,
    f1_threshold: float = 1e-4,
    compute_emd: bool = True,
    save_generated_samples: bool = False,
    save_dir: Optional[str] = None,
    save_name: str = "mvp_generated_data_{n}pts.h5",
    keep_generated: bool = False,
    unaugment_results: bool = False,
    print_every: int = 10,
    emd_eval_batch: int = 32,
) -> EvalResult:
    """Run generation + metrics over an iterator of host batches.

    Args:
      generate_fn: (batch dict) -> generated (B, N, 3) jax array, or
        (generated, {t: slice}) when capturing t-slices.  Typically a closure
        over a jitted sampler or refiner.
      batches: dicts with 'partial', 'complete', 'label' (+ 'generated',
        'XT', 'M_inv', 'translation' as the task needs).
    """
    cd_meter, emd_meter, f1_meter = AverageMeter(), AverageMeter(), AverageMeter()
    all_metrics = {"cd_distance": [], "emd_distance": [], "cd_p": [], "f1": []}
    labels = []
    total_generated = []
    slice_acc: dict = {}
    total_time = 0.0

    @jax.jit
    def metrics_fn(generated, gt):
        cd_p, cd_t, f1 = calc_cd(generated, gt, True, f1_threshold)
        return cd_p, cd_t, f1

    for idx, batch in enumerate(batches):
        gt = jnp.asarray(batch["complete"])
        t0 = time.time()
        out = generate_fn(batch)
        slices = None
        if isinstance(out, tuple):
            out, slices = out
        out = jax.block_until_ready(out)
        total_time += time.time() - t0

        if unaugment_results:
            M_inv = jnp.asarray(batch["M_inv"])
            translation = jnp.asarray(batch["translation"])
            out = unaugment(out, M_inv, translation)
            gt = unaugment(gt, M_inv, translation)
            if slices is not None:
                slices = {t: unaugment(v, M_inv, translation) for t, v in slices.items()}
        out = out / 2.0 / scale
        gt = gt / 2.0 / scale
        if slices is not None:
            slices = {t: np.asarray(v / 2.0 / scale) for t, v in slices.items()}

        cd_p, cd_t, f1 = metrics_fn(out, gt)
        if compute_emd:
            emds = []
            for i in range(0, out.shape[0], emd_eval_batch):
                emds.append(
                    earth_mover_distance(
                        out[i : i + emd_eval_batch], gt[i : i + emd_eval_batch]
                    )
                )
            emd = jnp.concatenate(emds)
        else:
            emd = jnp.zeros_like(cd_t)

        B = int(gt.shape[0])
        cd_meter.update(float(cd_t.mean()), n=B)
        emd_meter.update(float(emd.mean()), n=B)
        f1_meter.update(float(f1.mean()), n=B)
        all_metrics["cd_distance"].append(np.asarray(cd_t))
        all_metrics["emd_distance"].append(np.asarray(emd))
        all_metrics["cd_p"].append(np.asarray(cd_p))
        all_metrics["f1"].append(np.asarray(f1))
        labels.append(np.asarray(batch["label"]))

        if save_generated_samples or keep_generated:
            total_generated.append(np.asarray(out))
        if slices is not None:
            for t, v in slices.items():
                slice_acc.setdefault(t, []).append(v)

        if save_generated_samples:
            _write_h5_incremental(save_dir, save_name, total_generated, slice_acc)

        if idx % max(print_every, 1) == 0:
            print(
                f"progress [{idx}] CD {cd_meter.avg:.8f} EMD {emd_meter.avg:.8f} "
                f"F1 {f1_meter.avg:.6f} total generation time {total_time:.2f}s",
                flush=True,
            )

    gen = np.concatenate(total_generated, axis=0) if total_generated else None
    return EvalResult(
        avg_cd=cd_meter.avg,
        avg_emd=emd_meter.avg,
        labels=np.concatenate(labels) if labels else np.zeros(0, np.int64),
        metrics={k: np.concatenate(v) if v else np.zeros(0) for k, v in all_metrics.items()},
        total_generation_time=total_time,
        generated=gen if keep_generated or save_generated_samples else None,
        t_slices=(
            {t: np.concatenate(v, axis=0) for t, v in slice_acc.items()}
            if slice_acc
            else None
        ),
    )


def _write_h5_incremental(save_dir, save_name, total_generated, slice_acc):
    """Rewrite the full h5 after each batch (completion_eval.py:268-318)."""
    if h5py is None or save_dir is None:
        return
    os.makedirs(save_dir, exist_ok=True)
    data = np.concatenate(total_generated, axis=0)
    n = data.shape[1]
    with h5py.File(os.path.join(save_dir, save_name.format(n=n)), "w") as f:
        f.create_dataset("data", data=data)
    for t, chunks in slice_acc.items():
        sdata = np.concatenate(chunks, axis=0)
        name = save_name.format(n=sdata.shape[1]).replace(".h5", f"_T{t}.h5")
        with h5py.File(os.path.join(save_dir, name), "w") as f:
            f.create_dataset("data", data=sdata)
