from .meters import AverageMeter
from .logging import TensorBoardLogger

__all__ = ["AverageMeter", "TensorBoardLogger"]

from .profiling import trace, summarize_trace, StepTimer
from .neighbor_stats import (
    sa_ladder_neighbor_stats,
    count_stats,
    model_neighbor_stats,
    report as neighbor_report,
)
__all__ += [
    "trace",
    "summarize_trace",
    "StepTimer",
    "sa_ladder_neighbor_stats",
    "count_stats",
    "neighbor_report",
]
