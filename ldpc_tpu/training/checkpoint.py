"""Orbax-based checkpointing with optimizer state and mid-training resume.

The reference checkpoints only ``{model_state_dict, *histories}`` with no
optimizer state and no mid-epoch resume (``training/trainer.py:337-364``).
This manager keeps that payload shape as a capability (params + histories)
and adds what a production framework needs: optimizer state, step counter,
retention of the last N checkpoints, and exact training resume.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over `orbax.checkpoint.CheckpointManager`."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, params: Any, opt_state: Any = None,
             history: dict | None = None) -> None:
        payload = {"params": params}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        if history is not None:
            payload["history"] = history
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, step: int | None = None, template: Any = None) -> dict[str, Any]:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        if template is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def close(self) -> None:
        self._mgr.close()
