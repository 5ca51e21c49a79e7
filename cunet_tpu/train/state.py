"""Train state + optimizer factory.

Optimizer matches the reference recipe exactly (ref:cu-net.py:60-61):
``torch.optim.RMSprop(lr=2.5e-4, alpha=0.99, eps=1e-8)``. Torch RMSprop adds
eps *outside* the sqrt, so we set ``eps_in_sqrt=False``. The learning rate is
injected as a mutable hyperparameter so the per-epoch multiplicative decays
(ref:utils/util.py:106-134) and checkpoint-resume lr recovery
(ref:cu-net.py:116-117) work the same way they did on the torch optimizer.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp
import optax

from cunet_tpu.config import TrainConfig


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray          # global step counter
    params: Any                # model parameters pytree
    bn_state: Any              # batch-norm running statistics pytree
    opt_state: Any             # optax state (holds the injected lr)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """RMSprop with torch semantics and an injectable lr."""
    return optax.inject_hyperparams(
        lambda learning_rate: optax.rmsprop(
            learning_rate,
            decay=cfg.rmsprop_alpha,
            eps=cfg.rmsprop_eps,
            eps_in_sqrt=False,
        )
    )(learning_rate=cfg.lr)


def create_train_state(params, bn_state, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        bn_state=bn_state,
        opt_state=tx.init(params),
    )


def get_lr(state: TrainState) -> float:
    """Read the current lr out of the optimizer (resume semantics of
    ref:cu-net.py:116-117)."""
    return float(state.opt_state.hyperparams["learning_rate"])


def set_lr(state: TrainState, lr: float) -> TrainState:
    """In-place-style lr update, the analog of ref:utils/util.py:106-119
    mutating optimizer.param_groups."""
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    opt_state = state.opt_state._replace(hyperparams=hp)
    return state.replace(opt_state=opt_state)
