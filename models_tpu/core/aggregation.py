"""Aggregations: dict-of-tensors → single tensor merges, registered by name.

Mirrors ``merlin/models/tf/core/aggregation.py``: ``concat``, ``stack``, ``sum``,
``sum-residual``, ``element-wise-sum``, ``element-wise-sum-item-multi``, ``cosine``,
``element-wise-multiply``, ``masked_mean``, plus sequence aggregators
(mean/sum/max/min/masked-mean/last over the time axis).

All aggregations are pure functions of dicts of ``jnp.ndarray`` /
:class:`SequenceFeature`; XLA fuses them into surrounding matmuls.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import jax.numpy as jnp

from ..registry import aggregation_registry
from .block import Block
from .types import SequenceFeature, TensorDict

MIN_FLOAT = jnp.finfo(jnp.float32).min / 2.0


def _as_array(v, keep_mask: bool = False):
    if isinstance(v, SequenceFeature):
        return v.values
    return v


def _values(inputs: TensorDict):
    # deterministic order regardless of producer dict ordering (NNX graph
    # restore sorts mapping keys; eager calls preserve insertion order —
    # sorting here makes eager and jitted traces identical)
    return [_as_array(inputs[k]) for k in sorted(inputs)]


def _expand_2d(x):
    """(B,) → (B, 1) so scalars concat cleanly with projected features."""
    if x.ndim == 1:
        return x[:, None]
    return x


class TabularAggregation(Block):
    """Base for dict → tensor aggregations."""

    def __call__(self, inputs: TensorDict, **kwargs):
        raise NotImplementedError

    @staticmethod
    def parse(agg) -> Optional["TabularAggregation"]:
        if agg is None or isinstance(agg, Block):
            return agg
        return aggregation_registry.parse(agg)

    def _check_ranks(self, vals, name: str):
        ranks = {v.ndim for v in vals}
        if len(ranks) > 1:
            raise ValueError(
                f"{name}: mixed tensor ranks {sorted(ranks)}. Pool or broadcast sequence "
                f"features first (e.g. sequence_combiner='mean' or BroadcastToSequence)."
            )


@aggregation_registry.register("concat")
class ConcatFeatures(TabularAggregation):
    """Concatenate along the last axis (scalars promoted to (B, 1)).

    If any input is a SequenceFeature, the result is a SequenceFeature carrying
    the first input's mask (all sequence features in one batch share padding)."""

    def __init__(self, axis: int = -1):
        super().__init__()
        self.axis = axis

    def __call__(self, inputs: TensorDict, **kwargs):
        mask = None
        for v in inputs.values():
            if isinstance(v, SequenceFeature):
                mask = v.mask
                break
        vals = [_expand_2d(v) for v in _values(inputs)]
        self._check_ranks(vals, "concat")
        out = jnp.concatenate(vals, axis=self.axis)
        if mask is not None and out.ndim == 3:
            return SequenceFeature(out, mask)
        return out


@aggregation_registry.register("stack")
class StackFeatures(TabularAggregation):
    """Stack equal-dim features on a new axis — feeds dot-product interaction."""

    def __init__(self, axis: int = 1):
        super().__init__()
        self.axis = axis

    def __call__(self, inputs: TensorDict, **kwargs):
        vals = _values(inputs)
        self._check_ranks(vals, "stack")
        return jnp.stack(vals, axis=self.axis)


@aggregation_registry.register_with_multiple_names("sum", "element-wise-sum")
class ElementwiseSum(TabularAggregation):
    def __call__(self, inputs: TensorDict, **kwargs):
        vals = [_expand_2d(v) for v in _values(inputs)]
        out = vals[0]
        for v in vals[1:]:
            out = out + v
        return out


@aggregation_registry.register("sum-residual")
class SumResidual(TabularAggregation):
    def __init__(self, activation=None, shortcut_name: str = "shortcut"):
        super().__init__()
        self.activation = activation
        self.shortcut_name = shortcut_name

    def __call__(self, inputs: TensorDict, **kwargs):
        shortcut = _as_array(inputs[self.shortcut_name])
        out = None
        for name, v in inputs.items():
            if name == self.shortcut_name:
                continue
            v = _as_array(v) + shortcut
            if self.activation is not None:
                import jax

                v = getattr(jax.nn, self.activation)(v)
            out = v if out is None else out + v
        return out


@aggregation_registry.register("element-wise-multiply")
class ElementwiseMultiply(TabularAggregation):
    def __call__(self, inputs: TensorDict, **kwargs):
        vals = _values(inputs)
        out = vals[0]
        for v in vals[1:]:
            out = out * v
        return out


@aggregation_registry.register("element-wise-sum-item-multi")
class ElementwiseSumItemMulti(TabularAggregation):
    """Sum of context features + multiplication broadcast over item sequence
    (reference ``aggregation.py:242``): used by sequence models where one branch
    is 3-D item embeddings and the rest are 2-D context."""

    def __call__(self, inputs: TensorDict, **kwargs):
        seq = {k: v for k, v in inputs.items() if _as_array(v).ndim == 3}
        ctx = {k: v for k, v in inputs.items() if _as_array(v).ndim == 2}
        if len(seq) != 1:
            raise ValueError("element-wise-sum-item-multi expects exactly one 3-D input")
        item = _as_array(next(iter(seq.values())))
        if ctx:
            summed = ElementwiseSum()(ctx)
            item = item + summed[:, None, :]
        return item


@aggregation_registry.register("cosine")
class CosineSimilarity(TabularAggregation):
    """Row-wise cosine similarity of exactly two branches (two-tower scoring)."""

    def __call__(self, inputs: TensorDict, **kwargs):
        vals = _values(inputs)
        if len(vals) != 2:
            raise ValueError("cosine aggregation needs exactly 2 inputs")
        a, b = vals
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-12)
        b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-12)
        return jnp.sum(a * b, axis=-1, keepdims=True)


@aggregation_registry.register("masked_mean")
class MaskedMean(TabularAggregation):
    """Mean over axis 1 honoring each SequenceFeature's mask."""

    def __call__(self, inputs: TensorDict, **kwargs):
        out = {}
        for name, v in inputs.items():
            out[name] = sequence_mean(v)
        return ConcatFeatures()(out)


# ---------------------------------------------------------------------------
# Sequence (axis-1) aggregators — reference SequenceAggregator (:375)
# ---------------------------------------------------------------------------

def sequence_mean(x: Union[jnp.ndarray, SequenceFeature]) -> jnp.ndarray:
    if isinstance(x, SequenceFeature):
        m = x.mask[..., None].astype(x.values.dtype)
        denom = jnp.maximum(m.sum(axis=1), 1.0)
        return (x.values * m).sum(axis=1) / denom
    return jnp.mean(x, axis=1)


def sequence_sum(x) -> jnp.ndarray:
    if isinstance(x, SequenceFeature):
        m = x.mask[..., None].astype(x.values.dtype)
        return (x.values * m).sum(axis=1)
    return jnp.sum(x, axis=1)


def sequence_max(x) -> jnp.ndarray:
    if isinstance(x, SequenceFeature):
        m = x.mask[..., None]
        return jnp.max(jnp.where(m, x.values, MIN_FLOAT), axis=1)
    return jnp.max(x, axis=1)


def sequence_min(x) -> jnp.ndarray:
    if isinstance(x, SequenceFeature):
        m = x.mask[..., None]
        return jnp.min(jnp.where(m, x.values, -MIN_FLOAT), axis=1)
    return jnp.min(x, axis=1)


def sequence_last(x) -> jnp.ndarray:
    """Embedding at the last valid position of each row."""
    if isinstance(x, SequenceFeature):
        idx = jnp.maximum(x.lengths() - 1, 0)
        return jnp.take_along_axis(x.values, idx[:, None, None], axis=1)[:, 0]
    return x[:, -1]


SEQUENCE_COMBINERS = {
    "mean": sequence_mean,
    "masked-mean": sequence_mean,
    "sum": sequence_sum,
    "max": sequence_max,
    "min": sequence_min,
    "last": sequence_last,
}


class SequenceAggregator(TabularAggregation):
    """Apply a named combiner over axis 1 of every (3-D) input, then concat."""

    def __init__(self, combiner: str = "mean"):
        super().__init__()
        if combiner not in SEQUENCE_COMBINERS:
            raise ValueError(f"Unknown combiner {combiner}; options {sorted(SEQUENCE_COMBINERS)}")
        self.combiner = combiner

    def __call__(self, inputs: TensorDict, **kwargs):
        fn = SEQUENCE_COMBINERS[self.combiner]
        out = {}
        for name, v in inputs.items():
            arr = v.values if isinstance(v, SequenceFeature) else v
            out[name] = fn(v) if arr.ndim == 3 else arr
        return ConcatFeatures()(out)


@aggregation_registry.register("sequence-mean")
class SequenceMean(SequenceAggregator):
    def __init__(self):
        super().__init__("mean")


@aggregation_registry.register("sequence-sum")
class SequenceSum(SequenceAggregator):
    def __init__(self):
        super().__init__("sum")


@aggregation_registry.register("sequence-max")
class SequenceMax(SequenceAggregator):
    def __init__(self):
        super().__init__("max")


@aggregation_registry.register("sequence-min")
class SequenceMin(SequenceAggregator):
    def __init__(self):
        super().__init__("min")


@aggregation_registry.register("sequence-last")
class SequenceLast(SequenceAggregator):
    def __init__(self):
        super().__init__("last")
