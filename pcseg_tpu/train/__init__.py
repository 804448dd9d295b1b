from pcseg_tpu.train.optim import make_optimizer, step_lr
from pcseg_tpu.train.steps import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from pcseg_tpu.train.loop import train_model
