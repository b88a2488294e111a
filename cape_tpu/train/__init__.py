from cape_tpu.train.schedules import cape_schedule
from cape_tpu.train.optim import build_optimizer, TrainState, create_train_state
from cape_tpu.train.step import build_train_step, build_eval_step
