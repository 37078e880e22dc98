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
        if any(ch in self.directory for ch in "[]*?"):
            # tensorstore globs under this path during OCDBT merge; glob
            # metacharacters make the merge silently no-op and leave the
            # checkpoint unreadable
            raise ValueError(
                "checkpoint directory must not contain glob "
                f"metacharacters ([]*?): {self.directory!r}"
            )
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
        self,
        state_template: Any,
        step: Optional[int] = None,
        partial: bool = False,
    ) -> Tuple[Any, Optional[dict], Optional[int]]:
        """Restore ``(state, extra, step)``; returns the template unchanged
        when no checkpoint exists (fresh start).

        ``partial=True`` restores only the leaves present in the template —
        use for eval-time loading where the template's optimizer state need
        not match the trainer's (e.g. a schedule-less template against a
        checkpoint trained with an LR schedule)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return state_template, None, None
        if partial:
            restore_args = ocp.args.PyTreeRestore(
                state_template, partial_restore=True
            )
        else:
            restore_args = ocp.args.StandardRestore(state_template)
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(state=restore_args)
        )
        return restored["state"], self.restore_extra(step), step

    def restore_extra(self, step: Optional[int]) -> Optional[dict]:
        """Restore only the JSON ``extra`` payload of ``step`` (None if
        the step has none) — usable when the state tree itself cannot be
        restored (opt_state structure drift fallback)."""
        if step is None:
            return None
        extra_path = os.path.join(self.directory, str(step), "extra")
        if not os.path.exists(extra_path):
            return None
        restored_extra = self._mgr.restore(
            step, args=ocp.args.Composite(extra=ocp.args.JsonRestore())
        )
        return restored_extra.get("extra")

    def restore_for_eval(
        self,
        params_template: Any,
        batch_stats_template: Any,
        step: Optional[int] = None,
    ) -> Tuple[Any, Any, Optional[int]]:
        """Restore only ``(params, batch_stats)`` — optimizer-agnostic.

        For evaluation/ensembling, where the restoring process should not
        need to reconstruct the trainer's exact optimizer tree (LR
        schedules and momentum add structure to ``opt_state``)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return params_template, batch_stats_template, None
        template = {
            "params": params_template,
            "batch_stats": batch_stats_template,
        }
        # Direct PyTreeCheckpointer on the step's state dir: the manager
        # binds 'state' to the Standard handler (which requires the full
        # TrainState structure incl. the trainer's exact opt_state).
        restored = ocp.PyTreeCheckpointer().restore(
            os.path.join(self.directory, str(step), "state"),
            args=ocp.args.PyTreeRestore(template, partial_restore=True),
        )
        return restored["params"], restored["batch_stats"], step

    def close(self):
        self._mgr.close()
