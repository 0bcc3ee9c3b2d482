"""Train state: params, BN stats, optimizer state, EMA, step — one pytree.

Improvements over the reference checkpointing story (SURVEY §5.3/5.4): the
reference saves model weights only, so `--resume` silently loses optimizer
momentum, EMA, and LR position (reference train.py:49-50,160-162,276-279).
Here the full state round-trips through orbax.

Optimizer matches reference train.py:167-171: SGD, momentum 0.9, *coupled* L2
weight decay 5e-4 applied to every parameter (torch semantics: grad += wd·p
before the momentum update).

EMA matches reference utils/misc.py:67-86: decay = 0.9999·(1−e^(−updates/2000)),
tracking parameters AND BatchNorm statistics (ModelEMA copies the whole
state_dict).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


def make_optimizer(schedule) -> optax.GradientTransformation:
    """torch-equivalent SGD(momentum=0.9, weight_decay=5e-4)."""
    return optax.chain(
        optax.add_decayed_weights(5e-4),
        optax.trace(decay=0.9, nesterov=False),
        optax.scale_by_learning_rate(schedule),
    )


@flax.struct.dataclass
class TrainState:
    params: Any
    stats: Any                      # BatchNorm running statistics
    opt_state: Any
    step: jnp.ndarray               # int32 scalar
    ema_params: Optional[Any] = None
    ema_stats: Optional[Any] = None


def create_train_state(params, stats, tx: optax.GradientTransformation,
                       use_ema: bool = False) -> TrainState:
    return TrainState(
        params=params,
        stats=stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
        ema_stats=jax.tree.map(jnp.copy, stats) if use_ema else None,
    )


def ema_decay(updates):
    """reference utils/misc.py:72."""
    return 0.9999 * (1.0 - jnp.exp(-updates.astype(jnp.float32) / 2000.0))


def ema_update(ema_tree, new_tree, decay):
    return jax.tree.map(lambda e, p: e * decay + (1.0 - decay) * p,
                        ema_tree, new_tree)
