"""Ranking model zoo (reference ``merlin/models/tf/models/ranking.py``).

- :func:`DLRMModel` (``:23``) — embeddings + dot interaction + top MLP → heads
- :func:`DCNModel` (``:95``) — DCN-v2: input concat → CrossBlock stack (± deep MLP)
- :func:`DeepFMModel` (``:171``) — FM wide/2nd-order + deep MLP
- :func:`WideAndDeepModel` (``:276``) — linear wide path (one-hot/crosses) + deep MLP
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp

from ..blocks.cross import CrossBlock
from ..blocks.dlrm import DLRMBlock
from ..blocks.interaction import FMBlock
from ..blocks.mlp import MLPBlock
from ..core.block import Block, as_block, call_block
from ..core.combinators import ParallelBlock, SequentialBlock
from ..inputs.base import InputBlockV2
from ..outputs.base import ModelOutput, OutputBlock
from ..schema import Schema, Tags
from .base import Model


def _output(schema: Schema, prediction_tasks=None):
    if prediction_tasks is not None:
        return as_block(prediction_tasks)
    return OutputBlock(schema)


def DLRMModel(
    schema: Schema,
    embedding_dim: int = 64,
    bottom_block: Union[Block, Sequence[int], None] = None,
    top_block: Union[Block, Sequence[int], None] = (256, 128),
    prediction_tasks=None,
    seed: int = 0,
) -> Model:
    if isinstance(bottom_block, (list, tuple)):
        bottom_block = MLPBlock(list(bottom_block) + [embedding_dim], seed=seed)
    if isinstance(top_block, (list, tuple)):
        top_block = MLPBlock(top_block, seed=seed + 1)
    body = DLRMBlock(
        schema,
        embedding_dim=embedding_dim,
        bottom_block=bottom_block,
        top_block=top_block,
        seed=seed,
    )
    model = Model(body, _output(schema, prediction_tasks), schema=schema)
    model.block_name = "dlrm"
    return model


def DCNModel(
    schema: Schema,
    depth: int = 2,
    deep_block: Union[Block, Sequence[int], None] = (64, 32),
    stacked: bool = True,
    low_rank_dim: Optional[int] = None,
    embedding_dim: Optional[int] = None,
    prediction_tasks=None,
    seed: int = 0,
) -> Model:
    """DCN-v2: stacked (cross → deep) or parallel (cross ‖ deep → concat)."""
    if isinstance(deep_block, (list, tuple)):
        deep_block = MLPBlock(deep_block, seed=seed)
    inputs = InputBlockV2(schema, dim=embedding_dim, seed=seed)
    cross = CrossBlock(depth, low_rank_dim=low_rank_dim, seed=seed)
    if stacked:
        body = SequentialBlock([inputs, cross] + ([deep_block] if deep_block else []))
    else:
        body = SequentialBlock(
            [inputs, ParallelBlock({"cross": cross, "deep": deep_block}, aggregation="concat")]
        )
    model = Model(body, _output(schema, prediction_tasks), schema=schema)
    model.block_name = "dcn"
    return model


class _DeepFMBody(Block):
    """FM linear+pairwise term ‖ deep MLP over shared input block."""

    def __init__(self, schema, deep_block, latent_dim, seed):
        super().__init__(schema=schema.excluding_by_tag(Tags.TARGET))
        self.fm = FMBlock(self.schema, latent_dim=latent_dim, seed=seed)
        self.inputs = InputBlockV2(self.schema, dim=latent_dim, seed=seed)
        self.deep = deep_block

    def __call__(self, x, *, training=False, context=None, **kwargs):
        fm_out = self.fm(x)  # (B, 1)
        deep_in = self.inputs(x, training=training, context=context)
        deep_out = call_block(self.deep, deep_in, training=training, context=context)
        return jnp.concatenate([fm_out, deep_out], axis=-1)


def DeepFMModel(
    schema: Schema,
    embedding_dim: int = 64,
    deep_block: Union[Block, Sequence[int], None] = (64, 32),
    prediction_tasks=None,
    seed: int = 0,
) -> Model:
    if isinstance(deep_block, (list, tuple)):
        deep_block = MLPBlock(deep_block, seed=seed)
    body = _DeepFMBody(schema, deep_block, embedding_dim, seed)
    model = Model(body, _output(schema, prediction_tasks), schema=schema)
    model.block_name = "deepfm"
    return model


class _WidePath(Block):
    """Linear model over one-hot (+ hashed-cross) sparse categorical encodings
    (reference ``WideAndDeepModel``'s wide branch with CategoryEncoding)."""

    def __init__(self, schema, crosses: Optional[Sequence] = None, seed: int = 0):
        from ..transforms.features import CategoryEncoding, HashedCrossAll

        super().__init__(schema=schema.excluding_by_tag(Tags.TARGET))
        self.encoding = CategoryEncoding(self.schema.categorical, output_mode="multi_hot")
        if crosses:
            self.crosses = HashedCrossAll(self.schema.categorical, max_level=2, num_bins=1000)
        else:
            self.crosses = None
        from .base import Model  # noqa
        from ..blocks.mlp import Dense

        self.linear = Dense(1, use_bias=True, seed=seed)

    def __call__(self, x, *, training=False, context=None, **kwargs):
        enc = self.encoding(x)
        if self.crosses is not None:
            crossed = self.crosses(x)
            enc = jnp.concatenate([enc, crossed], axis=-1)
        return self.linear(enc)


def WideAndDeepModel(
    schema: Schema,
    embedding_dim: int = 32,
    deep_block: Union[Block, Sequence[int], None] = (64, 32),
    wide_schema: Optional[Schema] = None,
    enable_wide_crosses: bool = True,
    prediction_tasks=None,
    seed: int = 0,
) -> Model:
    if isinstance(deep_block, (list, tuple)):
        deep_block = MLPBlock(deep_block, seed=seed)
    wide_schema = wide_schema or schema
    wide = _WidePath(wide_schema, crosses=enable_wide_crosses or None, seed=seed)
    deep = SequentialBlock([InputBlockV2(schema, dim=embedding_dim, seed=seed), deep_block])
    body = ParallelBlock({"wide": wide, "deep": deep}, aggregation="concat")
    body.schema = schema.excluding_by_tag(Tags.TARGET)
    model = Model(body, _output(schema, prediction_tasks), schema=schema)
    model.block_name = "wide_and_deep"
    return model
