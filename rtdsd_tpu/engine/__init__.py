from rtdsd_tpu.engine.steps import (  # noqa: F401
    TrainState, create_train_state, make_eval_step, make_score_step,
    make_train_step, weighted_cross_entropy)
from rtdsd_tpu.engine.trainer import Trainer  # noqa: F401
from rtdsd_tpu.engine.checkpoint import restore_checkpoint, save_checkpoint  # noqa: F401
