"""Utility-layer tests: meters, step timer, neighbor stats, eval-result
bookkeeping, scalar logging."""

import numpy as np
import pytest

from point_diffusion_refinement_tpu.utils import (
    AverageMeter,
    StepTimer,
    TensorBoardLogger,
    count_stats,
    sa_ladder_neighbor_stats,
)


class TestMeters:
    def test_average_meter(self):
        m = AverageMeter("x")
        m.update(1.0, n=2)
        m.update(4.0, n=1)
        assert m.avg == pytest.approx(2.0)
        assert m.count == 3

    def test_step_timer_discards_warmup(self):
        t = StepTimer(warmup=1)
        for _ in range(3):
            with t:
                pass
        assert len(t.times) == 2
        assert t.best <= t.mean


class TestNeighborStats:
    def test_sa_ladder_stats(self, rng_np):
        xyz = rng_np.uniform(-0.5, 0.5, (2, 256, 3)).astype(np.float32)
        stats = sa_ladder_neighbor_stats(xyz, [64, 16], [0.2, 0.4], [16, 16])
        assert len(stats) == 2
        for s in stats:
            assert 0 <= s["min"] <= s["mean"] <= s["max"] <= 16
            assert len(s["quantiles"]) == 11

    def test_count_stats(self):
        s = count_stats(np.array([0, 5, 10]))
        assert s["min"] == 0 and s["max"] == 10 and s["mean"] == 5


class TestEvalResults:
    def test_gather_and_plot(self, tmp_path):
        from point_diffusion_refinement_tpu.cli.eval_results import (
            gather_eval_results,
            plot_result,
            save_eval_result,
        )

        for it, cd in ((10, 0.5), (20, 0.2), (30, 0.3)):
            save_eval_result(str(tmp_path), it, cd, cd * 2)
        g = gather_eval_results(str(tmp_path))
        assert g["iter"] == [10, 20, 30]
        assert g["avg_cd"] == [0.5, 0.2, 0.3]
        out = plot_result(g, save_path=str(tmp_path / "curve.png"))
        if out is not None:  # matplotlib present
            assert (tmp_path / "curve.png").exists()
        # find_max_epoch 'best' consumes the gathered file
        from point_diffusion_refinement_tpu.train import find_max_epoch

        assert find_max_epoch(
            str(tmp_path), "best",
            str(tmp_path / "gathered_eval_result.pkl"),
        ) == 20


class TestLogger:
    def test_jsonl_fallback_or_tb(self, tmp_path):
        lg = TensorBoardLogger(str(tmp_path))
        lg.add_scalar("loss", 1.5, 3)
        lg.close()
        import os

        assert os.listdir(tmp_path)  # wrote either TB events or scalars.jsonl
