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
    def save(self, step: int, model, opt_state=None, global_step=None) -> bool:
        graphdef, state = nnx.split(model)
        payload = {"model": nnx.to_pure_dict(state)}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        if global_step is not None:
            payload["global_step"] = np.asarray(int(global_step))
        saved = self.manager.save(step, args=self._ocp.args.StandardSave(payload))
        self.manager.wait_until_finished()
        return saved

    def restore(self, model, step: Optional[int] = None, opt_state=None):
        """Restore state into ``model`` (in place). Returns (step, opt_state).

        Without an ``opt_state`` template the checkpoint is read untyped (raw
        pytree), so weights-only restore works regardless of which extra keys
        (optimizer slots, global_step) the checkpoint carries."""
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {self.directory}")
        graphdef, state = nnx.split(model)
        if opt_state is not None:
            template = {"model": nnx.to_pure_dict(state), "opt_state": opt_state}
            restored = self.manager.restore(
                step, args=self._ocp.args.StandardRestore(template)
            )
        else:
            restored = self.manager.restore(step)
        nnx.replace_by_pure_dict(state, restored["model"])
        nnx.update(model, state)
        return step, restored.get("opt_state")

    def restore_training(self, model, data=None, step: Optional[int] = None,
                         mesh=None, shard_rules=None) -> int:
        """Full training resume: restore model weights AND optimizer slots, and
        arm the model so the next ``fit(initial_epoch=<returned>+1, ...)``
        continues the interrupted run with intact optimizer moments and step
        count (pair with ``ModelCheckpoint`` which snapshots all three).

        ``model`` must be compiled with the same optimizer config the
        checkpoint was written under; pass ``data`` (a Dataset/Loader) to
        build an un-built model, and the SAME ``mesh`` the resumed
        ``fit(mesh=...)`` will use — optimizer-state reuse is fingerprinted on
        the mesh placement and silently re-initializes on mismatch. Returns
        the restored checkpoint step (the epoch index when written by
        ``ModelCheckpoint``).

        Exact trajectory stitching holds for ``shuffle=False`` (deterministic
        batch order). With ``shuffle=True`` the resumed fit reshuffles from a
        fresh epoch counter — statistically equivalent but not bit-identical,
        matching the reference's Keras behavior across separate fit calls."""
        from ..blocks.optimizer import MultiOptimizer

        if not getattr(model, "_compiled", False):
            raise ValueError("compile() the model before restore_training")
        if data is not None:
            model.build(model._as_loader(data, None))
        if isinstance(model._tx, MultiOptimizer):
            raise ValueError(
                "restore_training does not support MultiOptimizer (its "
                "transform is rebuilt per fit, so slots cannot be re-armed)"
            )
        template_opt = model._tx.init(model._dense_params())
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {self.directory}")
        _, state = nnx.split(model)
        template = {
            "model": nnx.to_pure_dict(state),
            "opt_state": template_opt,
            "global_step": np.asarray(0),
        }
        try:
            restored = self.manager.restore(
                step, args=self._ocp.args.StandardRestore(template)
            )
        except Exception as e:  # noqa: BLE001 - surface the actionable cause
            raise ValueError(
                f"checkpoint {step} has no optimizer state (saved without "
                f"training_state?) or a mismatched optimizer config: {e}"
            ) from e
        nnx.replace_by_pure_dict(state, restored["model"])
        nnx.update(model, state)
        opt_state = restored["opt_state"]
        if mesh is not None:
            from ..parallel.mesh import shard_state

            opt_state = shard_state(opt_state, mesh, shard_rules)
        model.arm_training_state(opt_state, int(restored["global_step"]), mesh=mesh)
        return step

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
            ts = getattr(self.model, "training_state", lambda: None)()
            self.manager.save(
                epoch,
                self.model,
                opt_state=None if ts is None else ts["opt_state"],
                global_step=None if ts is None else ts["global_step"],
            )
