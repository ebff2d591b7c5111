"""Metric protocol: functional, jit-friendly streaming metrics.

A metric owns a small pytree ``state``; ``update`` runs *inside* the compiled
train/eval step (pure function state → state), ``result`` reads the final value on
host. This replaces Keras' mutable metric variables (reference ``tf/metrics/``)
with an explicitly-threaded functional state — the natural XLA shape.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp

from ..registry import metric_registry


class Metric:
    name: str = "metric"

    def __init__(self, name: Optional[str] = None):
        if name:
            self.name = name

    def init_state(self):
        raise NotImplementedError

    def update(self, state, outputs, targets, sample_weight=None):
        raise NotImplementedError

    def result(self, state):
        raise NotImplementedError

    @staticmethod
    def parse(m: Union[str, "Metric"]) -> "Metric":
        if isinstance(m, Metric):
            return m
        return metric_registry.parse(m)


def _flat_w(values, sample_weight):
    if sample_weight is None:
        return jnp.ones_like(values)
    w = sample_weight.astype(values.dtype)
    return jnp.broadcast_to(w.reshape(w.shape + (1,) * (values.ndim - w.ndim)), values.shape)


class MeanMetric(Metric):
    """Weighted running mean of a per-example function."""

    def __init__(self, fn: Optional[Callable] = None, name: str = "mean"):
        super().__init__(name)
        self._fn = fn

    def init_state(self):
        return {"total": jnp.zeros(()), "count": jnp.zeros(())}

    def per_example(self, outputs, targets):
        if self._fn is None:
            return outputs
        return self._fn(outputs, targets)

    def update(self, state, outputs, targets, sample_weight=None):
        vals = self.per_example(outputs, targets)
        w = _flat_w(vals, sample_weight)
        return {
            "total": state["total"] + jnp.sum(vals * w),
            "count": state["count"] + jnp.sum(w),
        }

    def result(self, state):
        return state["total"] / jnp.maximum(state["count"], 1e-9)


@metric_registry.register("binary_accuracy")
class BinaryAccuracy(MeanMetric):
    name = "binary_accuracy"

    def __init__(self, threshold: float = 0.5, name: str = "binary_accuracy"):
        super().__init__(name=name)
        self.threshold = threshold

    def per_example(self, outputs, targets):
        probs = jax.nn.sigmoid(outputs).reshape(-1)
        preds = (probs >= self.threshold).astype(jnp.float32)
        return (preds == targets.reshape(-1).astype(jnp.float32)).astype(jnp.float32)


@metric_registry.register("precision")
class Precision(Metric):
    name = "precision"

    def __init__(self, threshold: float = 0.5, name: str = "precision"):
        super().__init__(name)
        self.threshold = threshold

    def init_state(self):
        return {"tp": jnp.zeros(()), "fp": jnp.zeros(())}

    def update(self, state, outputs, targets, sample_weight=None):
        probs = jax.nn.sigmoid(outputs).reshape(-1)
        preds = probs >= self.threshold
        y = targets.reshape(-1) > 0.5
        w = jnp.ones_like(probs) if sample_weight is None else sample_weight.reshape(-1)
        return {
            "tp": state["tp"] + jnp.sum(w * (preds & y)),
            "fp": state["fp"] + jnp.sum(w * (preds & ~y)),
        }

    def result(self, state):
        return state["tp"] / jnp.maximum(state["tp"] + state["fp"], 1e-9)


@metric_registry.register("recall")
class Recall(Metric):
    name = "recall"

    def __init__(self, threshold: float = 0.5, name: str = "recall"):
        super().__init__(name)
        self.threshold = threshold

    def init_state(self):
        return {"tp": jnp.zeros(()), "fn": jnp.zeros(())}

    def update(self, state, outputs, targets, sample_weight=None):
        probs = jax.nn.sigmoid(outputs).reshape(-1)
        preds = probs >= self.threshold
        y = targets.reshape(-1) > 0.5
        w = jnp.ones_like(probs) if sample_weight is None else sample_weight.reshape(-1)
        return {
            "tp": state["tp"] + jnp.sum(w * (preds & y)),
            "fn": state["fn"] + jnp.sum(w * (~preds & y)),
        }

    def result(self, state):
        return state["tp"] / jnp.maximum(state["tp"] + state["fn"], 1e-9)


@metric_registry.register("auc")
class AUC(Metric):
    """Streaming ROC-AUC via threshold-bucketed confusion counts (Riemann sum),
    the same approximation Keras uses (default 200 thresholds)."""

    name = "auc"

    def __init__(self, num_thresholds: int = 200, name: str = "auc"):
        super().__init__(name)
        self.num_thresholds = num_thresholds

    def init_state(self):
        n = self.num_thresholds
        return {"tp": jnp.zeros((n,)), "fp": jnp.zeros((n,)), "pos": jnp.zeros(()), "neg": jnp.zeros(())}

    def update(self, state, outputs, targets, sample_weight=None):
        probs = jax.nn.sigmoid(outputs).reshape(-1)
        y = targets.reshape(-1).astype(jnp.float32)
        w = jnp.ones_like(probs) if sample_weight is None else sample_weight.reshape(-1).astype(jnp.float32)
        eps = 1e-7
        thresholds = jnp.linspace(0.0 - eps, 1.0 + eps, self.num_thresholds)
        above = probs[None, :] > thresholds[:, None]  # (T, B)
        tp = jnp.sum(above * (y * w)[None, :], axis=1)
        fp = jnp.sum(above * ((1.0 - y) * w)[None, :], axis=1)
        return {
            "tp": state["tp"] + tp,
            "fp": state["fp"] + fp,
            "pos": state["pos"] + jnp.sum(y * w),
            "neg": state["neg"] + jnp.sum((1.0 - y) * w),
        }

    def result(self, state):
        tpr = state["tp"] / jnp.maximum(state["pos"], 1e-9)
        fpr = state["fp"] / jnp.maximum(state["neg"], 1e-9)
        # integrate tpr d(fpr) with trapezoid rule; thresholds ascending → fpr descending
        return jnp.sum((fpr[:-1] - fpr[1:]) * (tpr[:-1] + tpr[1:]) / 2.0)


@metric_registry.register("logloss")
class LogLoss(MeanMetric):
    """Binary cross-entropy as an eval metric (reference ``evaluation.py:45``)."""

    name = "logloss"

    def __init__(self, name: str = "logloss"):
        super().__init__(name=name)

    def per_example(self, outputs, targets):
        logits = outputs.reshape(-1)
        y = targets.reshape(-1).astype(jnp.float32)
        return jnp.maximum(logits, 0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))


@metric_registry.register("rmse")
class RMSE(Metric):
    name = "rmse"

    def __init__(self, name: str = "rmse"):
        super().__init__(name)

    def init_state(self):
        return {"total": jnp.zeros(()), "count": jnp.zeros(())}

    def update(self, state, outputs, targets, sample_weight=None):
        err = jnp.square(outputs.reshape(-1) - targets.reshape(-1).astype(jnp.float32))
        w = jnp.ones_like(err) if sample_weight is None else sample_weight.reshape(-1)
        return {"total": state["total"] + jnp.sum(err * w), "count": state["count"] + jnp.sum(w)}

    def result(self, state):
        return jnp.sqrt(state["total"] / jnp.maximum(state["count"], 1e-9))


@metric_registry.register("mae")
class MAE(MeanMetric):
    name = "mae"

    def __init__(self, name: str = "mae"):
        super().__init__(name=name)

    def per_example(self, outputs, targets):
        return jnp.abs(outputs.reshape(-1) - targets.reshape(-1).astype(jnp.float32))
