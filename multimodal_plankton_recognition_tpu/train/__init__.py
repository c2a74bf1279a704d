from .state import TrainState, create_train_state
from .optim import make_optimizer
from .loop import (
    make_multi_steps, make_classifier_steps, fit, Fitter,
)
from .shard_step import make_multi_steps_shard_map
from .checkpoint import CheckpointManager, load_from_checkpoint
from .early_stopping import EarlyStopping
from .logging import MetricsWriter

__all__ = [
    "TrainState", "create_train_state", "make_optimizer",
    "make_multi_steps", "make_classifier_steps",
    "make_multi_steps_shard_map", "fit", "Fitter",
    "CheckpointManager", "load_from_checkpoint", "EarlyStopping",
    "MetricsWriter",
]
