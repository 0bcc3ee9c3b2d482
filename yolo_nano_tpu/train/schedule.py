"""Learning-rate schedule: quartic warmup + step decay.

Reference semantics (train.py:180-199): for the first wp_epoch epochs,
lr = base · (ni/nw)^4 with ni the global iteration; afterwards base lr decayed
×0.1 at each epoch in lr_epochs. Expressed here as a pure function of the
global step so it lives inside the jitted train step (the reference mutates
optimizer state from python each iteration).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def warmup_step_schedule(base_lr: float, epoch_size: int,
                         wp_epochs: int = 2,
                         lr_epochs: Sequence[int] = (90, 120),
                         warmup: bool = True):
    """Returns step → lr (float32 scalar), usable as an optax schedule."""
    nw = max(wp_epochs * epoch_size, 1)
    decay_steps = jnp.asarray([e * epoch_size for e in lr_epochs])

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        decays = jnp.sum(step >= decay_steps.astype(jnp.float32))
        lr = base_lr * jnp.power(0.1, decays.astype(jnp.float32))
        if warmup:
            wlr = base_lr * jnp.power(step / nw, 4.0)
            lr = jnp.where(step < nw, wlr, lr)
        return lr

    return schedule
