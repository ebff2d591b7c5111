"""Benchmark models (reference ``merlin/models/tf/models/benchmark.py``)."""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp

from ..blocks.mlp import MLPBlock
from ..core.block import Block, as_block, call_block
from ..inputs.embedding import EmbeddingTable
from ..outputs.base import OutputBlock
from ..schema import Schema, Tags, infer_embedding_dim
from .base import Model


class _NCFBody(Block):
    """Neural Collaborative Filtering body (reference ``NCFModel:32``):
    GMF branch (user ⊙ item embeddings) ‖ MLP branch (concat → MLP) → concat."""

    def __init__(self, schema: Schema, embedding_dim: int, mlp_block: Block, seed: int = 0):
        super().__init__(schema=schema.excluding_by_tag(Tags.TARGET))
        user_col = schema.user_id_column
        item_col = schema.item_id_column
        self.user_name, self.item_name = user_col.name, item_col.name
        # separate embeddings per branch, like the reference (GMF and MLP towers
        # learn different geometries)
        self.gmf_user = EmbeddingTable(embedding_dim, user_col, seed=seed)
        self.gmf_item = EmbeddingTable(embedding_dim, item_col, seed=seed + 1)
        self.mlp_user = EmbeddingTable(embedding_dim, user_col, seed=seed + 2)
        self.mlp_item = EmbeddingTable(embedding_dim, item_col, seed=seed + 3)
        self.mlp = mlp_block

    def __call__(self, inputs, *, training=False, context=None, **kwargs):
        u, i = inputs[self.user_name], inputs[self.item_name]
        gmf = self.gmf_user(u) * self.gmf_item(i)
        mlp_in = jnp.concatenate([self.mlp_user(u), self.mlp_item(i)], axis=-1)
        mlp_out = call_block(self.mlp, mlp_in, training=training, context=context)
        return jnp.concatenate([gmf, mlp_out], axis=-1)


def NCFModel(
    schema: Schema,
    embedding_dim: Optional[int] = None,
    mlp_block: Union[Block, Sequence[int]] = (64, 32),
    prediction_tasks=None,
    seed: int = 0,
) -> Model:
    if embedding_dim is None:
        embedding_dim = infer_embedding_dim(schema.item_id_column)
    if not isinstance(mlp_block, Block):
        mlp_block = MLPBlock(mlp_block, seed=seed)
    body = _NCFBody(schema, embedding_dim, mlp_block, seed=seed)
    output = prediction_tasks if prediction_tasks is not None else OutputBlock(schema)
    model = Model(body, as_block(output), schema=schema)
    model.block_name = "ncf"
    return model
