"""InputBlock: schema → (categorical ‖ continuous ‖ pretrained) parallel branches.

Reference: ``InputBlockV2`` (``merlin/models/tf/inputs/base.py:216-341``) with the
``INPUT_TAG_TO_BLOCK`` map. Only the V2 semantics are rebuilt (the deprecated V1
twins are intentionally dropped — SURVEY.md §7 build order note).
"""

from __future__ import annotations

from typing import Optional, Union

from ..core.block import Block
from ..core.combinators import ParallelBlock
from ..schema import Schema, Tags
from .continuous import Continuous
from .embedding import Embeddings, PretrainedEmbeddings


def InputBlockV2(
    schema: Schema,
    categorical: Union[Block, None] = None,
    continuous: Union[Block, None] = None,
    pretrained_embeddings: Union[Block, None] = None,
    aggregation: Optional[str] = "concat",
    seed: int = 0,
    **embeddings_kwargs,
) -> ParallelBlock:
    """Build the input layer from the schema.

    Columns tagged TARGET are excluded automatically. Branches:
      - ``categorical``: an ``Embeddings()`` ParallelBlock (override with any Block);
      - ``continuous``: shape-normalizing passthrough;
      - ``pretrained_embeddings``: columns tagged ``Tags.EMBEDDING``.
    Default aggregation concatenates everything into one (B, D) tensor.
    """
    schema = schema.excluding_by_tag(Tags.TARGET)
    branches = {}

    cat_schema = schema.categorical
    if categorical is not None:
        branches["categorical"] = categorical
    elif len(cat_schema):
        branches["categorical"] = Embeddings(cat_schema, seed=seed, **embeddings_kwargs)

    cont_schema = schema.continuous.excluding_by_tag(Tags.EMBEDDING)
    if continuous is not None:
        branches["continuous"] = continuous
    elif len(cont_schema):
        branches["continuous"] = Continuous(cont_schema)

    emb_schema = schema.select_by_tag(Tags.EMBEDDING)
    if pretrained_embeddings is not None:
        branches["pretrained_embeddings"] = pretrained_embeddings
    elif len(emb_schema):
        branches["pretrained_embeddings"] = PretrainedEmbeddings(emb_schema)

    if not branches:
        raise ValueError("Schema produced no input branches")

    return ParallelBlock(
        branches, aggregation=aggregation, block_name="input_block", schema=schema
    )


# The framework only ships V2 semantics; keep the familiar name as an alias.
InputBlock = InputBlockV2


def InputBlock(
    schema: Schema,
    aggregation: Optional[str] = "concat",
    continuous_projection=None,
    embedding_dims=None,
    embedding_dim_default: Optional[int] = None,
    seed: int = 0,
    **kwargs,
) -> ParallelBlock:
    """V1-flavored input constructor (reference ``tf/inputs/base.py:40``):
    thin adapter over :func:`InputBlockV2` accepting V1 argument names
    (``continuous_projection``, ``embedding_dims``/``embedding_dim_default``)."""
    from .continuous import ContinuousProjection

    dim = embedding_dims if embedding_dims is not None else embedding_dim_default
    continuous = None
    if continuous_projection is not None:
        cont_schema = schema.continuous
        if len(cont_schema):
            from ..blocks.mlp import MLPBlock

            proj = continuous_projection
            if isinstance(proj, (tuple, list)):
                proj = MLPBlock(tuple(proj))
            continuous = ContinuousProjection(cont_schema, proj)
    return InputBlockV2(
        schema, continuous=continuous, aggregation=aggregation, dim=dim,
        seed=seed, **kwargs,
    )
