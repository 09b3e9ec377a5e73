from .optim import build_optimizer, step_lr_schedule
from .train import TrainState, build_train_step, build_loss_cfg

__all__ = [
    "build_optimizer",
    "step_lr_schedule",
    "TrainState",
    "build_train_step",
    "build_loss_cfg",
]
