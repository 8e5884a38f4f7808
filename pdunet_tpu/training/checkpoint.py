"""Orbax checkpoint management (SURVEY.md §5.3-5.4).

Replaces Lightning's .ckpt files: composite state {params, opt_state, step,
rng} with keep-N rotation and auto-resume-from-latest — a crashed run picks
up where it left off (``train.py --resume auto``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


def _flip_remat_names(tree: Any) -> Any:
    """Swap flax's ``Scan_*`` ↔ ``ScanCheckpoint_*`` module names in a pytree.

    ``nn.scan(nn.remat(M))`` and ``nn.scan(M)`` produce mathematically
    identical parameters under different collection names, so flipping
    ``model.remat`` (an advertised speed/memory knob) would otherwise strand
    every existing checkpoint. The swap is an involution: applying it to the
    restore template maps it onto the on-disk naming, applying it again to
    the restored tree maps back.
    """

    def flip(k):
        if isinstance(k, str):
            if k.startswith("ScanCheckpoint_"):
                return "Scan_" + k[len("ScanCheckpoint_"):]
            if k.startswith("Scan_"):
                return "ScanCheckpoint_" + k[len("Scan_"):]
        return k

    def rec(t):
        if isinstance(t, dict):
            return type(t)((flip(k), rec(v)) for k, v in t.items())
        if isinstance(t, tuple):
            vals = [rec(v) for v in t]
            return type(t)(*vals) if hasattr(t, "_fields") else tuple(vals)
        if isinstance(t, list):
            return [rec(v) for v in t]
        if dataclasses.is_dataclass(t) and not isinstance(t, type):
            return dataclasses.replace(
                t,
                **{
                    f.name: rec(getattr(t, f.name))
                    for f in dataclasses.fields(t)
                    if f.init
                },
            )
        return t

    return rec(tree)


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
        try:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(state_template)
            )
        except ValueError as e:
            if "tree structures do not match" not in str(e):
                raise
            # Checkpoint saved under the other remat naming (Scan_* vs
            # ScanCheckpoint_*): restore through a name-flipped template,
            # then flip the result back. If the flip is a no-op (no scan
            # modules), re-raise the genuine mismatch.
            flipped = _flip_remat_names(state_template)
            import jax

            if jax.tree_util.tree_structure(flipped) == jax.tree_util.tree_structure(
                state_template
            ):
                raise
            try:
                restored = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(flipped)
                )
            except ValueError:
                # neither naming matches: the structural change is real —
                # most likely the optimizer tree (e.g. train.grad_clip
                # toggled, which wraps adam in optax.chain). Surface the
                # actual cause instead of the name-flipped mismatch.
                raise ValueError(
                    f"checkpoint at step {step} does not match the current "
                    "train-state structure under either remat naming — the "
                    "optimizer tree likely changed since it was saved "
                    "(e.g. train.grad_clip toggled). Restore with the "
                    "config the run was trained with."
                ) from e
            return _flip_remat_names(restored)

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
