from clair3_tpu.train.loss import focal_loss, multitask_loss  # noqa: F401
from clair3_tpu.train.step import TrainState, create_train_state, make_train_step  # noqa: F401
