"""Training harness: tasks, jitted loops, checkpointing, metrics.

Thin idiomatic replacement for the reference's PyTorch Lightning layer
(SURVEY.md §2b C10): the whole training step — on-device data synthesis,
forward, loss, backward, optimizer update — is one jitted function.
"""

from pdunet_tpu.training.tasks import Task, build_task, build_geometries
from pdunet_tpu.training.loop import train

__all__ = ["Task", "build_task", "build_geometries", "train"]
