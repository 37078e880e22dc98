"""Orbax checkpointing with real resume.

Strictly more capable than the reference, which saves ``tf.train.Checkpoint``
snapshots every ``save_freq`` epochs but has **no restore path at all**
(``main_gnn.py:315-318,421-428``; SURVEY §5 "Checkpoint / resume"), and no
checkpointing whatsoever on the spectrogram trainer.

Layout: ``<dir>/<step>/`` managed by Orbax ``CheckpointManager`` with
``max_to_keep=5`` (the reference's retention count).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, extra: Optional[dict] = None):
        payload = {"state": ocp.args.StandardSave(state)}
        if extra is not None:
            payload["extra"] = ocp.args.JsonSave(extra)
        self._mgr.save(step, args=ocp.args.Composite(**payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, state_template: Any, step: Optional[int] = None
    ) -> Tuple[Any, Optional[dict], Optional[int]]:
        """Restore ``(state, extra, step)``; returns the template unchanged
        when no checkpoint exists (fresh start)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return state_template, None, None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template)
            ),
        )
        extra = None
        extra_path = os.path.join(self.directory, str(step), "extra")
        if os.path.exists(extra_path):
            restored_extra = self._mgr.restore(
                step, args=ocp.args.Composite(extra=ocp.args.JsonRestore())
            )
            extra = restored_extra.get("extra")
        return restored["state"], extra, step

    def close(self):
        self._mgr.close()
