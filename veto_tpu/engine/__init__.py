from .batch import SGGBatch  # noqa: F401
from .train import TrainState, create_train_state, make_train_step, make_eval_step  # noqa: F401
