"""Input regularization transforms (reference ``tf/transforms/regularization.py``)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.block import Block
from ..core.types import SequenceFeature


class L2Norm(Block):
    """L2-normalize tensors (dict-aware) — two-tower cosine equivalence
    (reference ``L2Norm:27``)."""

    def __init__(self, epsilon: float = 1e-12):
        super().__init__()
        self.epsilon = epsilon

    def _norm(self, x):
        if isinstance(x, SequenceFeature):
            return SequenceFeature(self._norm(x.values), x.mask)
        return x / jnp.sqrt(
            jnp.maximum(jnp.sum(jnp.square(x), axis=-1, keepdims=True), self.epsilon)
        )

    def __call__(self, inputs, **kwargs):
        if isinstance(inputs, dict):
            return {k: self._norm(v) for k, v in inputs.items()}
        return self._norm(inputs)
