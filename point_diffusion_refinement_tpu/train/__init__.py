from .step import (
    TrainState,
    create_train_state,
    make_completion_train_step,
    make_refine_train_step,
    jit_step_for_mesh,
)
from .scheduler import QuantityScheduler

__all__ = [
    "TrainState",
    "create_train_state",
    "make_completion_train_step",
    "make_refine_train_step",
    "jit_step_for_mesh",
    "QuantityScheduler",
]
from .checkpoints import (
    save_checkpoint,
    load_checkpoint,
    find_max_epoch,
    maybe_resume,
    CKPT_PREFIX,
)
__all__ += [
    "save_checkpoint",
    "load_checkpoint",
    "find_max_epoch",
    "maybe_resume",
    "CKPT_PREFIX",
]
