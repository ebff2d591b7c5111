"""Beyond-accuracy evaluation metrics
(reference ``merlin/models/tf/metrics/evaluation.py``): novelty, popularity bias
and catalog coverage of the recommended top-k lists. All consume the top-k *ids*
produced by a TopK layer/output plus a precomputed item-frequency table.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..registry import metric_registry
from .base import Metric


class _TopKIdMetric(Metric):
    """Base: metrics over recommended item ids (B, k). ``outputs`` are scores and
    ``targets`` the id matrix when used standalone; inside the engine they come
    from TopKPrediction-style heads."""

    def __init__(self, item_frequencies: np.ndarray, k: int = 10, name: Optional[str] = None):
        super().__init__(name)
        freqs = jnp.asarray(item_frequencies, jnp.float32)
        self.probs = freqs / jnp.maximum(freqs.sum(), 1.0)
        self.num_items = freqs.shape[0]
        self.k = k


@metric_registry.register("novelty_at")
class NoveltyAt(_TopKIdMetric):
    """Mean -log2 popularity-probability of recommended items
    (reference ``NoveltyAt:239``): higher = less obvious recommendations."""

    name = "novelty_at"

    def init_state(self):
        return {"total": jnp.zeros(()), "count": jnp.zeros(())}

    def update(self, state, outputs, targets, sample_weight=None, **kw):
        ids = targets.astype(jnp.int32)[:, : self.k]
        # id -1 = top-k padding sentinel (k > valid candidates): exclude it
        # instead of clipping onto item 0's statistics
        valid = (ids >= 0).astype(jnp.float32)
        p = jnp.take(self.probs, jnp.clip(ids, 0, self.num_items - 1), axis=0)
        per = -jnp.log2(jnp.maximum(p, 1e-12)) * valid
        novelty = per.sum(axis=1) / jnp.maximum(valid.sum(axis=1), 1.0)
        w = jnp.ones_like(novelty) if sample_weight is None else sample_weight.reshape(-1)
        return {
            "total": state["total"] + jnp.sum(novelty * w),
            "count": state["count"] + jnp.sum(w),
        }

    def result(self, state):
        return state["total"] / jnp.maximum(state["count"], 1e-9)


@metric_registry.register("popularity_bias_at")
class PopularityBiasAt(_TopKIdMetric):
    """Mean popularity-probability of recommended items (reference ``:247``)."""

    name = "popularity_bias_at"

    def init_state(self):
        return {"total": jnp.zeros(()), "count": jnp.zeros(())}

    def update(self, state, outputs, targets, sample_weight=None, **kw):
        ids = targets.astype(jnp.int32)[:, : self.k]
        valid = (ids >= 0).astype(jnp.float32)  # exclude -1 padding sentinels
        p = jnp.take(self.probs, jnp.clip(ids, 0, self.num_items - 1), axis=0)
        bias = (p * valid).sum(axis=1) / jnp.maximum(valid.sum(axis=1), 1.0)
        w = jnp.ones_like(bias) if sample_weight is None else sample_weight.reshape(-1)
        return {
            "total": state["total"] + jnp.sum(bias * w),
            "count": state["count"] + jnp.sum(w),
        }

    def result(self, state):
        return state["total"] / jnp.maximum(state["count"], 1e-9)


@metric_registry.register("item_coverage_at")
class ItemCoverageAt(_TopKIdMetric):
    """Fraction of the catalog ever recommended (reference ``ItemCoverageAt:261``).
    State = a dense seen-bitmap (num_items,) — scatter-set per batch."""

    name = "item_coverage_at"

    def init_state(self):
        # one extra slot absorbs -1 padding sentinels (k > valid candidates)
        return {"seen": jnp.zeros((self.num_items + 1,), jnp.bool_)}

    def update(self, state, outputs, targets, sample_weight=None, **kw):
        ids = targets.astype(jnp.int32)[:, : self.k].reshape(-1)
        # -1 padding sentinels must not mark item 0 as recommended: route
        # them to the sacrificial overflow slot instead of clipping to 0
        idx = jnp.where((ids >= 0) & (ids < self.num_items), ids, self.num_items)
        seen = state["seen"].at[idx].set(True)
        return {"seen": seen}

    def result(self, state):
        return jnp.mean(state["seen"][: self.num_items].astype(jnp.float32))
