"""Training runtime: losses, schedules, optimizers, states, steps, metrics."""

from skeleton_action_recognition_tpu.train.losses import (
    softmax_cross_entropy,
)
from skeleton_action_recognition_tpu.train.schedules import (
    cyclic_triangular,
    piecewise_constant,
    reference_gnn_boundaries,
)
from skeleton_action_recognition_tpu.train.optim import (
    make_radar_optimizer,
    radar_physics_transform,
)
from skeleton_action_recognition_tpu.train.train_state import (
    TrainState,
    create_train_state,
)
from skeleton_action_recognition_tpu.train.steps import (
    eval_step,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "cyclic_triangular",
    "eval_step",
    "make_eval_step",
    "make_radar_optimizer",
    "make_train_step",
    "radar_physics_transform",
    "piecewise_constant",
    "reference_gnn_boundaries",
    "softmax_cross_entropy",
]
