from .optimizer import OptimizerConfig, make_optimizer  # noqa: F401
from .step import TrainConfig, make_train_step  # noqa: F401
