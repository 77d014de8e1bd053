from .trainer import TrainState, Trainer, make_optimizer, make_train_step
from .presets import TrainConfig, tetranerf_original_preset, tetranerf_preset

__all__ = [
    "TrainState",
    "Trainer",
    "make_optimizer",
    "make_train_step",
    "TrainConfig",
    "tetranerf_preset",
    "tetranerf_original_preset",
]
