from cunet_tpu.train.loss import (
    intermediate_mse,
    weighted_l2,
    weighted_sigmoid_crossentropy,
)
from cunet_tpu.train.schedule import FACE_DECAYS, MPII_DECAYS, lr_at_epoch
from cunet_tpu.train.state import (
    TrainState,
    create_train_state,
    get_lr,
    make_optimizer,
    set_lr,
)
from cunet_tpu.train.step import (
    eval_step,
    make_sharded_eval_step,
    make_sharded_train_step,
    make_shardmap_eval_step,
    train_step,
)

__all__ = [
    "FACE_DECAYS",
    "MPII_DECAYS",
    "TrainState",
    "create_train_state",
    "eval_step",
    "get_lr",
    "intermediate_mse",
    "lr_at_epoch",
    "make_optimizer",
    "make_sharded_eval_step",
    "make_sharded_train_step",
    "make_shardmap_eval_step",
    "set_lr",
    "train_step",
    "weighted_l2",
    "weighted_sigmoid_crossentropy",
]
