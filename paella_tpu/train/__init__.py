from .trainer import (
    Batch,
    NullCond,
    TrainState,
    apply_cond_dropout,
    create_train_state,
    loss_fn,
    make_optimizer,
    make_train_step,
    smoothed_weighted_ce,
)

__all__ = [
    "Batch",
    "NullCond",
    "TrainState",
    "apply_cond_dropout",
    "create_train_state",
    "loss_fn",
    "make_optimizer",
    "make_train_step",
    "smoothed_weighted_ce",
]
