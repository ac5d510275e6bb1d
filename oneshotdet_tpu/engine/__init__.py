from .trainer import (
    TrainState,
    batch_to_inputs,
    create_train_state,
    do_train,
    jit_train_step,
    make_train_step,
)

__all__ = [
    "TrainState",
    "batch_to_inputs",
    "create_train_state",
    "do_train",
    "jit_train_step",
    "make_train_step",
]
