"""V1 retrieval blocks (reference ``merlin/models/tf/blocks/retrieval/base.py``).

The V2 design folds these into ``RetrievalModelV2`` + ``ContrastiveOutput``;
these constructors provide the V1 vocabulary for users migrating from the
reference, mapped onto the same TPU-native machinery.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from ..core.block import Block
from ..core.combinators import ParallelBlock, SequentialBlock
from ..inputs.base import InputBlockV2
from ..outputs.contrastive import ContrastiveOutput
from ..schema import Schema, Tags


class TowerBlock(SequentialBlock):
    """A named single tower (reference ``retrieval/base.py:42``)."""

    def __init__(self, block: Block, block_name: str = "tower"):
        super().__init__([block], block_name=block_name)


def DualEncoderBlock(
    query: Block, item: Block, aggregation=None, block_name: str = "dual_encoder"
) -> ParallelBlock:
    """ParallelBlock{query, candidate} (reference ``retrieval/base.py:59``)."""
    pb = ParallelBlock({"query": query, "candidate": item}, aggregation=aggregation)
    pb.block_name = block_name
    return pb


def ItemRetrievalScorer(
    samplers: Union[str, Sequence] = "in-batch",
    sampling_downscore_false_negatives: bool = True,
    item_id_feature_name: Optional[str] = None,
    logits_temperature: float = 1.0,
    **kwargs,
) -> ContrastiveOutput:
    """Dot-product positive + sampled negatives + false-negative downscore
    (reference ``retrieval/base.py:134``) — the V2 ContrastiveOutput with V1
    argument names."""
    return ContrastiveOutput(
        negative_samplers=samplers,
        target=item_id_feature_name,
        downscore_false_negatives=sampling_downscore_false_negatives,
        logits_temperature=logits_temperature,
        **kwargs,
    )


def TwoTowerBlock(
    schema: Schema,
    query_tower: Block,
    item_tower: Optional[Block] = None,
    embedding_dim: Optional[int] = None,
    seed: int = 0,
) -> ParallelBlock:
    """Schema-split dual encoder: USER-tagged features → query tower, ITEM-tagged
    → item tower (re-seeded copy of query tower when absent; reference
    ``retrieval/two_tower.py:32``)."""
    user_schema = schema.select_by_tag(Tags.USER).excluding_by_tag(Tags.TARGET)
    item_schema = schema.select_by_tag(Tags.ITEM).excluding_by_tag(Tags.TARGET)
    if not len(user_schema) or not len(item_schema):
        raise ValueError("TwoTowerBlock needs USER- and ITEM-tagged columns")
    # fresh_copy re-seeds initializers (and accepts raw-module/string specs):
    # a plain deepcopy would make both towers start with identical weights
    from ..core.block import fresh_copy

    item_tower = item_tower if item_tower is not None else fresh_copy(query_tower, 1)
    query = SequentialBlock(
        [InputBlockV2(user_schema, dim=embedding_dim, seed=seed), query_tower]
    )
    item = SequentialBlock(
        [InputBlockV2(item_schema, dim=embedding_dim, seed=seed + 1), item_tower]
    )
    return DualEncoderBlock(query, item, block_name="two_tower")


def MatrixFactorizationBlock(
    schema: Schema, dim: int, seed: int = 0, aggregation=None
) -> ParallelBlock:
    """User-id × item-id embedding towers (reference
    ``retrieval/matrix_factorization.py:115``)."""
    from ..core.encoder import EmbeddingEncoder
    from ..inputs.embedding import EmbeddingTable

    user_col = schema.select_by_tag(Tags.USER_ID).first
    item_col = schema.select_by_tag(Tags.ITEM_ID).first
    query = EmbeddingEncoder(EmbeddingTable(dim, user_col, seed=seed))
    item = EmbeddingEncoder(EmbeddingTable(dim, item_col, seed=seed + 1))
    return DualEncoderBlock(query, item, aggregation=aggregation, block_name="mf")


def QueryItemIdsEmbeddingsBlock(
    schema: Schema, dim: int, seed: int = 0, aggregation=None
) -> ParallelBlock:
    """V1 name for the user-id × item-id embedding towers (reference
    ``retrieval/matrix_factorization.py:31``)."""
    return MatrixFactorizationBlock(schema, dim, seed=seed, aggregation=aggregation)
