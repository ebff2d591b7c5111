"""Retrieval model zoo (reference ``merlin/models/tf/models/retrieval.py``).

- :func:`MatrixFactorizationModel` (reference ``:311,409`` V2 semantics): user-id and
  item-id embedding tables, in-batch contrastive softmax with weight tying.
- :func:`TwoTowerModel` (reference ``:489``): schema-split user/item towers with MLP
  heads, dot-product contrastive training.
- :func:`YoutubeDNNRetrievalModel` (reference ``:206``): session features → MLP →
  sampled softmax over the item catalog.

All return a :class:`RetrievalModelV2` exposing ``query_embeddings`` /
``candidate_embeddings`` / ``to_top_k_encoder`` for index building and serving.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..core.block import Block, as_block
from ..core.combinators import ParallelBlock, SequentialBlock
from ..core.encoder import EmbeddingEncoder, Encoder, TopKEncoder
from ..core.types import SequenceFeature
from ..blocks.mlp import MLPBlock
from ..data.dataset import Dataset
from ..inputs.base import InputBlockV2
from ..inputs.embedding import EmbeddingTable, Embeddings
from ..outputs.contrastive import ContrastiveOutput
from ..schema import Schema, Tags, infer_embedding_dim
from .base import Model


class RetrievalModelV2(Model):
    """Encoder(s) + contrastive output (reference ``tf/models/base.py:2491``)."""

    def __init__(self, *blocks, query: Block = None, candidate: Block = None, output=None,
                 schema: Optional[Schema] = None):
        if blocks:
            super().__init__(*blocks, schema=schema)
            self._query = None
            self._candidate = None
        else:
            assert query is not None and output is not None
            if candidate is not None:
                encoder = ParallelBlock({"query": query, "candidate": candidate})
                super().__init__(encoder, output, schema=schema)
            else:
                super().__init__(query, output, schema=schema)
            self._query = query
            self._candidate = candidate

    # ------------------------------------------------------------------
    @property
    def query_encoder(self) -> Block:
        return self._query if self._query is not None else self.first

    @property
    def candidate_encoder(self) -> Optional[Block]:
        return self._candidate

    @property
    def contrastive_output(self) -> ContrastiveOutput:
        for h in self.heads():
            if isinstance(h, ContrastiveOutput):
                return h
        raise ValueError("Model has no ContrastiveOutput head")

    # ------------------------------------------------------------------
    def query_embeddings(self, dataset: Optional[Dataset] = None, batch_size: int = 1024,
                         index: Union[str, Tags, None] = Tags.USER_ID) -> Dataset:
        """Encode queries (reference ``:2536``)."""
        enc = self.query_encoder
        if dataset is None and isinstance(enc, EmbeddingEncoder):
            return enc.to_dataset()
        encoder = enc if isinstance(enc, Encoder) else Encoder(enc)
        return encoder.encode(dataset, index=index, batch_size=batch_size)

    def candidate_embeddings(self, dataset: Optional[Dataset] = None, batch_size: int = 1024,
                             index: Union[str, Tags, None] = Tags.ITEM_ID) -> Dataset:
        """Export/encode the candidate catalog (reference ``:2563``)."""
        head = self.contrastive_output
        if self._candidate is None:
            # weight tying: the item table IS the catalog
            return head.to_dataset()
        if dataset is None:
            raise ValueError("Two-tower candidate_embeddings needs an item dataset")
        item_id = None
        if isinstance(index, Tags):
            sel = dataset.schema.select_by_tag(index)
            item_id = sel.first.name if len(sel) else None
        else:
            item_id = index
        if item_id is not None and item_id in dataset.schema:
            dataset = dataset.unique_by(item_id)
        encoder = self._candidate if isinstance(self._candidate, Encoder) else Encoder(self._candidate)
        return encoder.encode(dataset, index=index, batch_size=batch_size)

    def to_top_k_encoder(self, candidates: Optional[Dataset] = None, k: int = 10,
                         batch_size: int = 1024, mesh=None, candidate_dtype=None):
        """Build a servable/evaluable brute-force top-k model (reference ``:2632``).
        ``mesh`` row-shards the candidate index over the model axis;
        ``candidate_dtype=jnp.bfloat16`` stores the index half-width (the
        serving top-k streams the whole catalog per query batch, so this
        halves its HBM cost — the standard vector-DB quantization trade)."""
        cand_ds = self.candidate_embeddings(candidates, batch_size=batch_size)
        head = self.contrastive_output
        item_id_name = head.item_id_name
        return TopKEncoder(
            self.query_encoder, candidates=cand_ds, k=k, item_id_name=item_id_name,
            mesh=mesh, candidate_dtype=candidate_dtype,
        )

    # reference V1 name (tf/models/base.py:2449)
    to_top_k_recommender = to_top_k_encoder

    def evaluate(self, data, batch_size: Optional[int] = None, item_corpus=None,
                 k: int = 10, mesh=None, **kwargs):
        """V1 parity: ``evaluate(item_corpus=...)`` scores queries against the
        FULL corpus via a brute-force index built from the item tower
        (reference ``RetrievalModel.evaluate``, ``tf/models/base.py:2266``),
        instead of in-batch negatives."""
        if item_corpus is None:
            return super().evaluate(data, batch_size=batch_size, **kwargs)
        corpus = None if item_corpus is True else item_corpus
        topk = self.to_top_k_encoder(corpus, k=k, mesh=mesh)
        return topk.evaluate(data, batch_size=batch_size, **kwargs)


def MatrixFactorizationModel(
    schema: Schema,
    dim: Optional[int] = None,
    negative_samplers: Union[str, Sequence] = "in-batch",
    logits_temperature: float = 1.0,
    logq_correction: bool = True,
    l2_reg: float = 0.0,
    post: Optional[Block] = None,
    table_dtype=None,
    seed: int = 0,
) -> RetrievalModelV2:
    """User-id × item-id embedding dot product with sampled-softmax training.

    ``table_dtype=jnp.bfloat16`` stores both id tables bf16 at rest (half HBM,
    stochastic-rounding updates — requires a sparse ``embedding_optimizer``)."""
    user_col = schema.user_id_column
    item_col = schema.item_id_column
    if dim is None:
        dim = max(infer_embedding_dim(user_col), infer_embedding_dim(item_col))

    tkw = {} if table_dtype is None else {"dtype": table_dtype}
    user_table = EmbeddingTable(dim, user_col, l2_reg=l2_reg, seed=seed, **tkw)
    item_table = EmbeddingTable(dim, item_col, l2_reg=l2_reg, seed=seed + 1, **tkw)

    query = EmbeddingEncoder(user_table)
    output = ContrastiveOutput(
        item_table,
        negative_samplers=negative_samplers,
        logits_temperature=logits_temperature,
        logq_sampling_correction=logq_correction,
        post=post,
    )
    model = RetrievalModelV2(query=query, output=output, schema=schema)
    model.block_name = "matrix_factorization"
    return model


MatrixFactorizationModelV2 = MatrixFactorizationModel


def TwoTowerModel(
    schema: Schema,
    query_tower: Union[Block, Sequence[int], None] = (128, 64),
    item_tower: Union[Block, Sequence[int], None] = None,
    embedding_dim: Optional[int] = None,
    negative_samplers: Union[str, Sequence] = "in-batch",
    logits_temperature: float = 1.0,
    l2_norm: bool = False,
    dropout: Optional[float] = None,
    post: Optional[Block] = None,
    table_dtype=None,
    seed: int = 0,
) -> RetrievalModelV2:
    """Schema-split user/item MLP towers (reference ``TwoTowerModelV2 :489``).

    ``query_tower``/``item_tower``: either full Blocks or MLP dim tuples applied on
    top of auto-built input blocks. ``l2_norm`` L2-normalizes both tower outputs
    (cosine training, reference ``transforms/regularization.py:27``).
    ``post`` attaches to the contrastive head's Prediction (e.g.
    :class:`~models_tpu.outputs.ContrastiveSampleWeight`).
    """
    from ..transforms.regularization import L2Norm

    user_schema = schema.select_by_tag(Tags.USER)
    item_schema = schema.select_by_tag(Tags.ITEM)
    if not len(user_schema) or not len(item_schema):
        raise ValueError("TwoTowerModel needs USER- and ITEM-tagged columns")

    def build_tower(tower, tower_schema, tower_seed):
        if isinstance(tower, Block):
            return tower
        dims = tuple(tower) if tower is not None else (128, 64)
        in_kw = {} if table_dtype is None else {"param_dtype": table_dtype}
        layers = [
            InputBlockV2(tower_schema, dim=embedding_dim, seed=tower_seed, **in_kw),
            MLPBlock(dims, dropout=dropout, no_activation_last_layer=True, seed=tower_seed),
        ]
        if l2_norm:
            layers.append(L2Norm())
        block = SequentialBlock(layers)
        block.schema = tower_schema.excluding_by_tag(Tags.TARGET)
        return block

    query = build_tower(query_tower, user_schema, seed)
    if item_tower is None and isinstance(query_tower, Block):
        # never alias one Block instance into both towers (shared parameters);
        # a re-seeded copy matches the reference's clone semantics
        from ..core.block import fresh_copy

        item_tower = fresh_copy(query_tower, 1)
    candidate = build_tower(item_tower if item_tower is not None else query_tower,
                            item_schema, seed + 100)

    output = ContrastiveOutput(
        schema.item_id_column,
        negative_samplers=negative_samplers,
        logits_temperature=logits_temperature,
        post=post,
    )
    model = RetrievalModelV2(query=query, candidate=candidate, output=output, schema=schema)
    model.block_name = "two_tower"
    return model


TwoTowerModelV2 = TwoTowerModel


def YoutubeDNNRetrievalModel(
    schema: Schema,
    top_block: Union[Block, Sequence[int]] = (64,),
    num_sampled: int = 100,
    embedding_dim: Optional[int] = None,
    logits_temperature: float = 1.0,
    seed: int = 0,
) -> RetrievalModelV2:
    """Session features → MLP → sampled softmax over the catalog
    (reference ``:206`` — the YouTubeDNN candidate-generation architecture)."""
    from ..outputs.sampling import PopularityBasedSampler

    item_col = schema.item_id_column
    dim = embedding_dim or infer_embedding_dim(item_col)
    input_schema = schema.excluding_by_tag(Tags.TARGET)

    item_table = EmbeddingTable(dim, item_col, seed=seed)
    if not isinstance(top_block, Block):
        top_block = MLPBlock(tuple(top_block) + (dim,), no_activation_last_layer=True, seed=seed)

    inputs = InputBlockV2(
        input_schema.excluding_by_name(item_col.name), dim=embedding_dim, seed=seed
    ) if len(input_schema.excluding_by_name(item_col.name).categorical) or len(
        input_schema.continuous
    ) else None

    sampler = PopularityBasedSampler(
        max_num_samples=num_sampled, max_id=item_col.cardinality - 1, seed=seed
    )
    output = ContrastiveOutput(
        item_table,
        negative_samplers=[sampler],
        logits_temperature=logits_temperature,
    )
    blocks = ([inputs] if inputs is not None else []) + [top_block, output]
    query = SequentialBlock([b for b in blocks[:-1]])
    model = RetrievalModelV2(query=query, output=output, schema=schema)
    model.block_name = "youtube_dnn"
    return model
