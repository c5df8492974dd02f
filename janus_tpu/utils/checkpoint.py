"""Orbax checkpointing for the NN-training workflows.

The reference has no checkpoint/resume at all (SURVEY §5) — its closest
artifact is a CSV dataset round-trip. Training neural Hamiltonians through
the solver warrants real checkpoints; this is a thin orbax wrapper so
training scripts stay one-liner simple.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any


def save_checkpoint(path, pytree: Any, step: int = 0) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(pytree))
        mgr.wait_until_finished()


def restore_checkpoint(path, template: Any = None, step: int | None = None):
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.CheckpointManager(path) as mgr:
        if step is None:
            step = mgr.latest_step()
        if template is None:
            return mgr.restore(step)
        return mgr.restore(step, args=ocp.args.StandardRestore(template))
