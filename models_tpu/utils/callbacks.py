"""Training callbacks (reference ``merlin/models/tf/logging/callbacks.py``).

The engine calls ``set_model`` / ``on_epoch_begin`` / ``on_batch_end`` /
``on_epoch_end`` (duck-typed — any object with some of these works).
"""

from __future__ import annotations

import time
from typing import Optional


class Callback:
    model = None

    def set_model(self, model):
        self.model = model

    def on_epoch_begin(self, epoch):
        pass

    def on_batch_end(self, step, logs):
        pass

    def on_epoch_end(self, epoch, logs):
        pass


class ExamplesPerSecondCallback(Callback):
    """Throughput every N batches (reference ``ExamplesPerSecondCallback:124``)."""

    def __init__(self, batch_size: int, every_n_steps: int = 100, log_fn=print):
        self.batch_size = batch_size
        self.every_n_steps = every_n_steps
        self.log_fn = log_fn
        self._t0 = None
        self._epoch_t0 = None
        self._count = 0
        self.history = []

    def on_epoch_begin(self, epoch):
        self._t0 = time.perf_counter()
        self._epoch_t0 = self._t0
        self._count = 0

    def on_batch_end(self, step, logs):
        self._count += 1
        if self._count % self.every_n_steps == 0:
            dt = time.perf_counter() - self._t0
            eps = self.every_n_steps * self.batch_size / max(dt, 1e-9)
            self.history.append(eps)
            self.log_fn(f"examples/sec (last {self.every_n_steps} steps): {eps:,.0f}")
            self._t0 = time.perf_counter()


class WandbLogger(Callback):
    """Weights & Biases logging (reference ``WandbLogger:8``). No-ops cleanly when
    wandb is unavailable (this environment has no egress)."""

    def __init__(self, project: str = "models-tpu", run_name: Optional[str] = None, config=None):
        try:
            import wandb  # noqa

            self._wandb = wandb
        except ImportError:
            self._wandb = None
        self.project = project
        self.run_name = run_name
        self.config = config or {}
        self._run = None

    def set_model(self, model):
        super().set_model(model)
        if self._wandb is not None and self._run is None:
            self._run = self._wandb.init(project=self.project, name=self.run_name,
                                         config=self.config)

    def on_epoch_end(self, epoch, logs):
        if self._run is not None:
            self._wandb.log(dict(logs), step=epoch)

    def finish(self):
        if self._run is not None:
            self._run.finish()


class EarlyStopping(Callback):
    """Stop when a monitored metric stops improving."""

    def __init__(self, monitor: str = "loss", patience: int = 3, mode: str = "min",
                 min_delta: float = 0.0):
        self.monitor = monitor
        self.patience = patience
        self.mode = mode
        self.min_delta = min_delta
        self.best = None
        self.wait = 0

    def on_epoch_end(self, epoch, logs):
        value = logs.get(self.monitor)
        if value is None:
            return
        improved = (
            self.best is None
            or (self.mode == "min" and value < self.best - self.min_delta)
            or (self.mode == "max" and value > self.best + self.min_delta)
        )
        if improved:
            self.best = value
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience and self.model is not None:
                self.model.stop_training = True


class ProfilerCallback(Callback):
    """Capture a jax.profiler trace for selected steps (TPU timeline inspection)."""

    def __init__(self, log_dir: str = "/tmp/jax_trace", start_step: int = 5, num_steps: int = 5):
        self.log_dir = log_dir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def on_batch_end(self, step, logs):
        import jax

        if step + 1 == self.start_step and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step + 1 == self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False


class CSVLogger(Callback):
    """Append per-epoch logs to a CSV file (Keras ``CSVLogger`` parity — the
    reference inherits it from Keras; columns are unioned across epochs)."""

    def __init__(self, filename: str, separator: str = ",", append: bool = False):
        self.filename = filename
        self.sep = separator
        self.append = append
        self._keys = None
        self._file = None
        self._rows = []  # (epoch, logs) written this run, for header widening
        self._fixed_header = False  # appending to a pre-existing file

    def _write_row(self, epoch, logs):
        row = [str(epoch)] + [
            f"{logs[k]:.6g}" if k in logs else "" for k in self._keys
        ]
        self._file.write(self.sep.join(row) + "\n")

    def on_epoch_end(self, epoch, logs):
        logs = dict(logs or {})
        self._rows.append((epoch, logs))
        if self._file is None:
            mode = "a" if self.append else "w"
            self._file = open(self.filename, mode)
            self._keys = sorted(logs)
            # appending to a file that already has content: its header is on
            # disk and cannot be widened — keep the first epoch's columns
            self._fixed_header = self.append and self._file.tell() > 0
            if not self._fixed_header:
                self._file.write(self.sep.join(["epoch"] + self._keys) + "\n")
        elif not self._fixed_header and not set(logs) <= set(self._keys):
            # new columns appeared (e.g. val_* with validation_freq > 1):
            # union the keys and rewrite this run's file with the wider header
            self._keys = sorted(set(self._keys) | set(logs))
            self._file.close()
            self._file = open(self.filename, "w")
            self._file.write(self.sep.join(["epoch"] + self._keys) + "\n")
            for e, lg in self._rows[:-1]:
                self._write_row(e, lg)
        self._write_row(epoch, logs)
        self._file.flush()

    def on_train_end(self, logs=None):
        if self._file is not None:
            self._file.close()
            self._file = None


class TerminateOnNaN(Callback):
    """Stop training when a non-finite loss appears (Keras parity).

    Checked at epoch end, not per batch: mid-epoch loss scalars live on
    device, and fetching one per batch would cost a tunnel round-trip each
    (the engine collects them in ONE epoch-end transfer)."""

    def on_epoch_end(self, epoch, logs):
        import numpy as np

        loss = (logs or {}).get("loss")
        if loss is not None and not np.isfinite(float(loss)):
            print(f"epoch {epoch}: non-finite loss {loss}; terminating training")
            if self.model is not None:
                self.model.stop_training = True
