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


def ContinuousProjection(schema: Schema, projection) -> "Block":
    """Concat continuous features then project through a block (reference
    ``continuous.py:54``)."""
    from ..core.combinators import SequentialBlock
    from ..core.aggregation import ConcatFeatures

    class _Concat(Block):
        def __call__(self, inputs, **kwargs):
            return ConcatFeatures()(inputs)

    return SequentialBlock(
        [Continuous(schema), _Concat(), projection], block_name="continuous_projection"
    )
