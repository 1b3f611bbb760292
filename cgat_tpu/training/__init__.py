from . import losses, schedules
from .lamb import lamb
from .trainer import (
    CheckpointManager,
    MetricsLogger,
    Trainer,
    TrainerConfig,
    TrainState,
    load_trainer,
    make_eval_step,
    make_optimizer,
    make_predict_step,
    make_train_step,
    set_learning_rate,
)

__all__ = [
    "losses",
    "schedules",
    "lamb",
    "CheckpointManager",
    "MetricsLogger",
    "Trainer",
    "TrainerConfig",
    "TrainState",
    "load_trainer",
    "make_eval_step",
    "make_optimizer",
    "make_predict_step",
    "make_train_step",
    "set_learning_rate",
]
