"""Orbax checkpoint management (SURVEY.md §5.3-5.4).

Replaces Lightning's .ckpt files: composite state {params, opt_state, step,
rng} with keep-N rotation and auto-resume-from-latest — a crashed run picks
up where it left off (``train.py --resume auto``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for train-state pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 3, save_interval_steps: int = 1):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        return bool(saved)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
