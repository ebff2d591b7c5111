"""Continuous feature blocks (reference ``merlin/models/tf/inputs/continuous.py``)."""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp

from ..core.block import Block
from ..core.types import SequenceFeature, TensorDict
from ..schema import Schema, Tags


class Continuous(Block):
    """Select continuous columns and normalize shapes:

    scalar (B,) → (B, 1); sequence (B, L) → SequenceFeature with values (B, L, 1).
    Keeps a dict output so downstream aggregation can concat or pool.
    """

    def __init__(self, schema: Optional[Schema] = None):
        if schema is not None:
            schema = schema.continuous if len(schema.continuous) else schema
        super().__init__(schema=schema, block_name="continuous")

    def set_schema(self, schema: Optional[Schema]):
        if schema is not None and self.schema is None:
            self.schema = schema.continuous
        return self

    def __call__(self, inputs: TensorDict, **kwargs):
        names = self.schema.column_names if self.schema is not None else list(inputs)
        out = {}
        for name in names:
            if name not in inputs:
                continue
            v = inputs[name]
            if isinstance(v, SequenceFeature):
                vals = v.values
                if vals.ndim == 2:
                    vals = vals[..., None]
                out[name] = SequenceFeature(vals.astype(jnp.float32), v.mask)
            else:
                if v.ndim == 1:
                    v = v[:, None]
                out[name] = v.astype(jnp.float32)
        return out


class ContinuousEmbedding(Block):
    """Soft-embedding of continuous features (reference ``ContinuousEmbedding``,
    ``tf/inputs/embedding.py:1439``): each scalar attends over a small learned
    embedding table via a softmax projection — a smooth alternative to binning.

    out = softmax(x · W_proj) @ E, with E (num_embeddings, dim).
    """

    def __init__(self, num_embeddings: int = 10, dim: int = 8, seed: int = 0):
        import jax
        from flax import nnx

        super().__init__(block_name="continuous_embedding")
        key1, key2 = jax.random.split(jax.random.key(seed))
        self.proj = nnx.Param(jax.random.normal(key1, (1, num_embeddings)) * 0.05)
        self.table = nnx.Param(jax.random.normal(key2, (num_embeddings, dim)) * 0.05)

    def _embed(self, x):
        import jax

        if x.ndim == 1:
            x = x[:, None]
        weights = jax.nn.softmax(x @ self.proj.value, axis=-1)
        return weights @ self.table.value

    def __call__(self, inputs, **kwargs):
        if isinstance(inputs, dict):
            return {k: self._embed(v) for k, v in inputs.items()
                    if not isinstance(v, SequenceFeature)}
        return self._embed(inputs)


class ConcatDict(Block):
    """Concat a feature dict along the last axis (module-level so it config-
    serializes; used by ContinuousProjection)."""

    def __call__(self, inputs, **kwargs):
        from ..core.aggregation import ConcatFeatures

        return ConcatFeatures()(inputs)


def ContinuousProjection(schema: Schema, projection) -> "Block":
    """Concat continuous features then project through a block (reference
    ``continuous.py:54``)."""
    from ..core.combinators import SequentialBlock

    return SequentialBlock(
        [Continuous(schema), ConcatDict(), projection], block_name="continuous_projection"
    )
