from panopticnerf_tpu.train.loss import compute_losses, cross_entropy_logits, cross_entropy_probs
from panopticnerf_tpu.train.step import (
    TrainState,
    make_lr_schedule,
    make_optimizer,
    make_train_state,
    make_train_step,
)

__all__ = [
    "TrainState",
    "compute_losses",
    "cross_entropy_logits",
    "cross_entropy_probs",
    "make_lr_schedule",
    "make_optimizer",
    "make_train_state",
    "make_train_step",
]
