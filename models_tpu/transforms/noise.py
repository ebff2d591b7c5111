"""Input corruption regularizers (reference ``merlin/models/tf/transforms/noise.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.block import Block
from ..core.types import SequenceFeature, TensorDict


class StochasticSwapNoise(Block):
    """Replace each feature value with one from another row of the batch with
    probability ``pad_ratio`` during training (reference ``StochasticSwapNoise:29``).
    Stateless: keys derive from (seed, step) like Dropout."""

    def __init__(self, pad_ratio: float = 0.1, seed: int = 0):
        super().__init__()
        self.pad_ratio = float(pad_ratio)
        self.seed = seed

    def _swap(self, v, key):
        k1, k2 = jax.random.split(key)
        if isinstance(v, SequenceFeature):
            vals = self._swap(v.values, key)
            return SequenceFeature(vals, v.mask)
        B = v.shape[0]
        perm = jax.random.permutation(k1, B)
        swap = jax.random.bernoulli(k2, self.pad_ratio, v.shape)
        return jnp.where(swap, v[perm], v)

    def __call__(self, inputs, *, training: bool = False, context=None, **kwargs):
        if not training or self.pad_ratio == 0.0:
            return inputs
        step = context.get("step", 0) if context is not None else 0
        base = jax.random.fold_in(jax.random.key(self.seed), jnp.asarray(step, jnp.uint32))
        if isinstance(inputs, dict):
            out = {}
            for i, (name, v) in enumerate(sorted(inputs.items())):
                out[name] = self._swap(v, jax.random.fold_in(base, i))
            return {k: out.get(k, v) for k, v in inputs.items()}
        return self._swap(inputs, base)
