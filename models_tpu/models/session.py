"""Session-based sequential recommendation models.

Parity target: the reference's example 08 (session-based next-item transformer
with sampled softmax over the full catalog; ``merlin/models/tf/transformers/`` +
``transforms/sequence.py``).

Train with a sequence transform as the ``pre`` hook:

    model = SessionBasedTransformerModel(schema, GPT2Block(64, 4, 2))
    model.fit(ds, pre=SequencePredictNext(schema, target="item_id_seq"))
    model.evaluate(ds, pre=SequencePredictLast(schema, target="item_id_seq"))
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp

from ..blocks.mlp import Dense
from ..core.block import Block, as_block
from ..core.combinators import SequentialBlock
from ..core.types import SequenceFeature
from ..inputs.base import InputBlockV2
from ..inputs.embedding import EmbeddingTable
from ..outputs.contrastive import ContrastiveOutput
from ..outputs.sampling import PopularityBasedSampler
from ..schema import Schema, Tags
from ..transformer.block import TransformerBlock
from ..transforms.sequence import ReplaceMaskedEmbeddings
from .base import Model
from .retrieval import RetrievalModelV2


class _SequenceConcat(Block):
    """Concat mixed 2-D context and 3-D sequence features into (B, L, D):
    context features broadcast along the time axis (reference
    ``BroadcastToSequence``, ``transforms/features.py:1118``)."""

    def __call__(self, inputs: dict, **kwargs):
        mask = None
        for v in inputs.values():
            if isinstance(v, SequenceFeature):
                mask = v.mask
                break
        if mask is None:
            raise ValueError("Session model needs at least one sequence feature")
        L = mask.shape[1]
        parts = []
        for name in sorted(inputs):
            v = inputs[name]
            if isinstance(v, SequenceFeature):
                arr = v.values
            else:
                arr = v
            if arr.ndim == 1:
                arr = arr[:, None]
            if arr.ndim == 2:
                arr = jnp.repeat(arr[:, None, :], L, axis=1)
            parts.append(arr)
        return SequenceFeature(jnp.concatenate(parts, axis=-1), mask)


class _ProjectToTableDim(Block):
    """Project transformer hidden states to the item-table dim for weight tying."""

    def __init__(self, dim: int, seed: int = 0):
        super().__init__()
        self.dense = Dense(dim, use_bias=False, seed=seed)
        self.dim = dim

    def __call__(self, inputs, **kwargs):
        if isinstance(inputs, SequenceFeature):
            if inputs.values.shape[-1] == self.dim:
                return inputs
            return SequenceFeature(self.dense(inputs.values), inputs.mask)
        if inputs.shape[-1] == self.dim:
            return inputs
        return self.dense(inputs)


def _find_item_table(input_block, item_domain: str) -> EmbeddingTable:
    from ..core.block import iter_blocks

    for b in iter_blocks(input_block):
        if isinstance(b, EmbeddingTable) and b.block_name == item_domain:
            return b
    raise ValueError(f"No embedding table for domain {item_domain!r} in input block")


def SessionBasedTransformerModel(
    schema: Schema,
    transformer: Union[TransformerBlock, None] = None,
    embedding_dim: Optional[int] = None,
    num_sampled: Optional[int] = None,
    masked_lm: bool = False,
    logits_temperature: float = 1.0,
    seed: int = 0,
) -> RetrievalModelV2:
    """Sequence features → transformer → sampled softmax over the item catalog.

    ``num_sampled=None`` uses in-batch negatives over the flattened positions;
    an int adds popularity (zipfian) sampled negatives with logQ correction.
    ``masked_lm=True`` inserts :class:`ReplaceMaskedEmbeddings` (pair with
    ``SequenceMaskRandom`` as the fit ``pre``).
    """
    item_col = schema.select_by_tag(Tags.ITEM_ID).first
    input_schema = schema.excluding_by_tag(Tags.TARGET)
    inputs = SequentialBlock(
        [InputBlockV2(input_schema, dim=embedding_dim, aggregation=None, seed=seed),
         _SequenceConcat()]
    )
    item_table = _find_item_table(inputs, item_col.domain_name)

    if transformer is None:
        transformer = TransformerBlock(d_model=item_table.dim, n_heads=4, n_layers=2,
                                       causal=not masked_lm, seed=seed)

    samplers = ["in-batch"]
    if num_sampled:
        samplers = [
            PopularityBasedSampler(
                max_num_samples=num_sampled, max_id=item_col.cardinality - 1, seed=seed
            )
        ]
    output = ContrastiveOutput(
        item_table,
        negative_samplers=samplers,
        logits_temperature=logits_temperature,
    )

    blocks = [inputs]
    if masked_lm:
        blocks.append(ReplaceMaskedEmbeddings())
    blocks += [transformer, _ProjectToTableDim(item_table.dim, seed=seed)]
    query = SequentialBlock(blocks)
    model = RetrievalModelV2(query=query, output=output, schema=schema)
    model.block_name = "session_transformer"
    return model
