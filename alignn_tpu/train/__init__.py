"""Training runtime (reference L4: `alignn/train.py`, `alignn/utils.py`)."""

from alignn_tpu.train.optim import build_optimizer, onecycle_lr
from alignn_tpu.train.state import TrainState, create_train_state
from alignn_tpu.train.trainer import train_model

__all__ = [
    "build_optimizer",
    "onecycle_lr",
    "TrainState",
    "create_train_state",
    "train_model",
]
