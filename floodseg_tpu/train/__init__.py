from floodseg_tpu.train.state import TrainState, create_train_state
from floodseg_tpu.train.optim import (
    poly_schedule,
    make_optimizer,
    head_mask,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "poly_schedule",
    "make_optimizer",
    "head_mask",
]
