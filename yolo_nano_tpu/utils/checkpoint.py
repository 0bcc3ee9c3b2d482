"""Full-train-state checkpointing via orbax.

Upgrade over the reference, which saves model weights only at eval epochs —
`--resume` silently loses optimizer momentum, EMA, and LR position
(reference train.py:49-50,160-162,276-279; SURVEY §5.3/5.4). Here the whole
TrainState (params, BN stats, optimizer state, EMA, step) round-trips, with
retention of the last N checkpoints.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from yolo_nano_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, step: int, state: TrainState, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, state_template: TrainState,
                step: Optional[int] = None) -> TrainState:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_params(path: str, params) -> None:
    """Weights-only export (deploy artifact, reference torch.save analog).
    Overwrites an existing artifact; blocks until the (async) write completes
    — callers are typically CLIs that exit immediately after."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_params(path: str, template):
    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(os.path.abspath(path), template)
    finally:
        ckptr.close()
