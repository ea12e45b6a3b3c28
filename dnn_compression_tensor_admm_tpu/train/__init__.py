"""L5 training engine: losses, optimizers/schedules, train state, loops."""

from .losses import (
    cross_entropy, soft_target_cross_entropy, distillation_loss)
from .optim import make_optimizer, make_schedule, riemannian_sgd
from .state import TrainState, create_train_state
from .engine import train_model, evaluate_model, eval_runtime, TrainConfig
