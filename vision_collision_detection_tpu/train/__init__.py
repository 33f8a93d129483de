from vision_collision_detection_tpu.train.optim import (
    build_optimizer,
    cosine_annealing_schedule,
)
from vision_collision_detection_tpu.train.steps import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
    weighted_loss,
)
from vision_collision_detection_tpu.train.notebook import (
    run_notebook_equivalent,
)
from vision_collision_detection_tpu.train.trainer import (
    SingleDeviceStrategy,
    Trainer,
)

__all__ = [
    "run_notebook_equivalent",
    "build_optimizer",
    "cosine_annealing_schedule",
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
    "weighted_loss",
    "SingleDeviceStrategy",
    "Trainer",
]
