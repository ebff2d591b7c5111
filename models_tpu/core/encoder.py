"""Encoders: inference-only wrappers for offline embedding sweeps and top-k serving.

Reference: ``merlin/models/tf/core/encoder.py`` (Encoder:40, TopKEncoder:427,
EmbeddingEncoder:667). The reference runs offline encodes through Dask
``map_partitions``; here the sweep is a jitted forward over loader batches —
one process, async host→device feeding, TPU does the matmuls.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..data.dataset import Dataset
from ..data.loader import Loader, ROW_VALID_KEY
from ..schema import ColumnSchema, Schema, Tags
from .block import Block, as_block, call_block
from .types import ModelContext, to_device_batch


class Encoder(Block):
    """Wrap a block for batch inference; refuses ``fit`` (reference ``:298-313``)."""

    def __init__(self, *blocks, schema: Optional[Schema] = None):
        super().__init__(schema=schema)
        from .combinators import SequentialBlock

        self.block = blocks[0] if len(blocks) == 1 else SequentialBlock(list(blocks))
        if schema is None:
            self.schema = getattr(self.block, "schema", None)

    def __call__(self, inputs, **kwargs):
        return call_block(self.block, inputs, **kwargs)

    def fit(self, *args, **kwargs):
        raise RuntimeError("Encoder is inference-only; train the parent model instead")

    def encode(
        self,
        dataset: Union[Dataset, Loader],
        index: Optional[Union[str, ColumnSchema, Tags]] = None,
        batch_size: int = 1024,
    ) -> Dataset:
        """Sweep the dataset through the block; return (index, embedding) rows."""
        loader = dataset if isinstance(dataset, Loader) else Loader(dataset, batch_size)
        index_name = None
        if index is not None:
            if isinstance(index, ColumnSchema):
                index_name = index.name
            elif isinstance(index, Tags) or (isinstance(index, str) and index in [t.value for t in Tags]):
                sel = loader.schema.select_by_tag(index)
                index_name = sel.first.name if len(sel) else None
            else:
                index_name = str(index)

        graphdef, state = nnx.split(self)

        @jax.jit
        def step(state, x):
            mod = nnx.merge(graphdef, state)
            context = ModelContext(features=x)
            # call the ENCODER (not .block): subclasses like EmbeddingEncoder
            # override __call__ to pull their feature out of the batch dict
            return call_block(mod, x, training=False, context=context)

        ids, chunks = [], []
        for x, _ in loader:
            out = step(state, to_device_batch(x))
            valid = np.asarray(x[ROW_VALID_KEY])
            arr = np.asarray(out)[valid]
            chunks.append(arr)
            if index_name is not None:
                ids.append(np.asarray(x[index_name])[valid])
        emb = np.concatenate(chunks, axis=0)
        data = {}
        if index_name is not None:
            data["id"] = np.concatenate(ids, axis=0)
        else:
            data["id"] = np.arange(len(emb))
        data["embedding"] = emb
        return Dataset(data)

    def batch_predict(self, dataset, batch_size: int = 1024) -> Dataset:
        return self.encode(dataset, batch_size=batch_size)


class EmbeddingEncoder(Encoder):
    """A single embedding table as an encoder (reference ``:667``)."""

    def __init__(self, table, feature_name: Optional[str] = None):
        from ..inputs.embedding import EmbeddingTable

        assert isinstance(table, EmbeddingTable)
        super().__init__(table, schema=table.schema)
        self.table = table
        self.feature_name = feature_name or table.features[0]

    def __call__(self, inputs, **kwargs):
        # context MUST flow through to the table: it carries the sparse-
        # optimizer tap hook (and the mesh for sharded lookups). Dropping it
        # silently froze the query table of MatrixFactorizationModel under
        # embedding_optimizer= — the in-batch objective still "learned" via
        # the candidate table, which is what hid the bug.
        context = kwargs.get("context")
        feature = self.feature_name
        if isinstance(inputs, dict):
            val = inputs.get(feature)
            if val is None:
                # allow any feature this table serves
                for f in self.table.features:
                    if f in inputs:
                        val, feature = inputs[f], f
                        break
            if val is None:
                raise KeyError(f"{self.feature_name} not found in inputs")
            return self.table._call_single(val, feature=feature, context=context)
        return self.table._call_single(inputs, feature=feature, context=context)

    def to_dataset(self) -> Dataset:
        return self.table.to_dataset()


def TopKEncoder(
    query_encoder: Block,
    candidates: Union[Dataset, tuple, None] = None,
    k: int = 10,
    topk_layer: str = "brute-force-topk",
    item_id_name: Optional[str] = None,
    mesh=None,
    candidate_dtype=None,
):
    """Query-encoder + indexed top-k head, as an evaluable model
    (reference ``TopKEncoder:427`` — it *is* a BaseModel so ``.evaluate()`` gives
    Recall@k/NDCG@k against the corpus). ``mesh`` row-shards the candidate
    matrix over the model axis and serves queries via sharded_topk."""
    from ..models.base import Model
    from ..outputs.topk import TopKOutput

    output = TopKOutput(
        to_call=topk_layer, k=k, candidates=candidates, item_id_name=item_id_name,
        mesh=mesh, candidate_dtype=candidate_dtype,
    )
    model = Model(query_encoder, output)
    model.block_name = "topk_encoder"
    return model
