"""Step checkpointing with orbax (SURVEY.md §5: restartable step checkpoints —
beyond the reference's SavedModel-only persistence).

``CheckpointManager`` saves/restores (model state, optimizer state, step) so a
preempted training job resumes mid-run. Multi-host: only the chief writes
(mirroring the reference's rank-0-only save, ``tf/models/base.py:1614``), which
jax/orbax handles via process-index-aware IO.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import nnx


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, save_interval_steps: int = 1):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, save_interval_steps=save_interval_steps
            ),
        )

    # ------------------------------------------------------------------
    def save(self, step: int, model, opt_state=None) -> bool:
        graphdef, state = nnx.split(model)
        payload = {"model": nnx.to_pure_dict(state)}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        saved = self.manager.save(step, args=self._ocp.args.StandardSave(payload))
        self.manager.wait_until_finished()
        return saved

    def restore(self, model, step: Optional[int] = None, opt_state=None):
        """Restore state into ``model`` (in place). Returns (step, opt_state)."""
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {self.directory}")
        graphdef, state = nnx.split(model)
        template = {"model": nnx.to_pure_dict(state)}
        if opt_state is not None:
            template["opt_state"] = opt_state
        restored = self.manager.restore(step, args=self._ocp.args.StandardRestore(template))
        nnx.replace_by_pure_dict(state, restored["model"])
        nnx.update(model, state)
        return step, restored.get("opt_state")

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def all_steps(self):
        return list(self.manager.all_steps())


class ModelCheckpoint:
    """Callback: checkpoint every N epochs via CheckpointManager."""

    def __init__(self, directory: str, every_n_epochs: int = 1, max_to_keep: int = 3):
        self.manager = CheckpointManager(directory, max_to_keep=max_to_keep)
        self.every = every_n_epochs
        self.model = None

    def set_model(self, model):
        self.model = model

    def on_epoch_end(self, epoch, logs):
        if (epoch + 1) % self.every == 0 and self.model is not None:
            self.manager.save(epoch, self.model)
