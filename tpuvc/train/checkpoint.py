"""Checkpoint save/restore via Orbax.

The reference checkpoints with tf.train.Saver every N steps into
logdir/train/<timestamp>/ and restores via --restore_from (util/wrapper.py,
SURVEY.md SS5.3-5.4).  Orbax gives the same capability with async-capable,
jax-native checkpoints; auto-resume-from-latest reproduces the reference's
manual restart-with-flag contract.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    @property
    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore_latest(self, template: Any) -> tuple[Any, int] | None:
        """Restore the newest checkpoint into the template's structure."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(
            template))
        return state, step
