from .checkpoint import CheckpointManager
from .optim import (build_sgd, freeze_swin_early, imbsam_gradients,
                    sam_gradients)
from .schedule import reference_warmup_exp_schedule
from .state import TrainState
from .trainer import (
    create_train_state,
    make_spatial_eval_step,
    make_spatial_train_step,
    make_tcn_eval_step,
    make_tcn_train_step,
)

__all__ = [
    "CheckpointManager",
    "build_sgd",
    "freeze_swin_early",
    "sam_gradients",
    "imbsam_gradients",
    "reference_warmup_exp_schedule",
    "TrainState",
    "create_train_state",
    "make_spatial_train_step",
    "make_spatial_eval_step",
    "make_tcn_train_step",
    "make_tcn_eval_step",
]
