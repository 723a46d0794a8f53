from . import config, logging, optimizers
from .checkpoint import CheckpointManager
from .preemption import TimeoutHandler
from .train import TrainState, create_train_state, make_eval_step, make_train_step
