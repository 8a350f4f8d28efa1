from .optimizer import make_optimizer, warmup_multistep_schedule
from .trainer import TrainState, create_train_state, make_train_step

__all__ = [
    "make_optimizer",
    "warmup_multistep_schedule",
    "TrainState",
    "create_train_state",
    "make_train_step",
]
