from .meters import AverageMeter
from .logging import TensorBoardLogger

__all__ = ["AverageMeter", "TensorBoardLogger"]
