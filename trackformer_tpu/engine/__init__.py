from .train_step import TrainState, make_optimizer, make_train_step  # noqa: F401
