"""Name-level parity for the reference torch namespace
(``merlin/models/torch/__init__.py`` ``__all__``).

Each symbol here is either a thin alias onto the DSL's native construct or a
compact real implementation of the reference behavior; the coverage test
(``tests/unit/test_backends.py::test_torch_namespace_coverage``) parses the
reference ``__all__`` and asserts every name resolves in ``torch_backend``.
Dask-backed pieces (DaskEncoder/DaskPredictor) are rebuilt Dask-free over the
shared Loader.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence as Seq, Union

import numpy as np

import torch
import torch.nn as nn

from ..schema import ColumnSchema, Schema, Tags
from .dsl import (
    Batch,
    Block,
    Concat,
    EmbeddingTable,
    EmbeddingTables,
    ParallelBlock,
    SelectKeys,
    TorchSequence,
    _call,
    _fresh_copy,
)

# reference ``Sequence`` (torch/batch.py:26)
Sequence = TorchSequence


def repeat(module: nn.Module, n: int = 1) -> Block:
    """n deep copies chained (reference ``block.py:678``)."""
    import copy

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    return Block(*[copy.deepcopy(module) for _ in range(n)])


def repeat_parallel(module: nn.Module, n: int = 1, agg=None) -> ParallelBlock:
    """n parallel copies with fresh init (reference ``block.py:704``)."""
    return ParallelBlock({str(i): _fresh_copy(module) for i in range(n)}, agg=agg)


def repeat_parallel_like(module: nn.Module, like, agg=None) -> ParallelBlock:
    """One copy per key of ``like`` (reference ``block.py:719``)."""
    keys = list(like.keys() if hasattr(like, "keys") else like)
    return ParallelBlock({str(k): _fresh_copy(module) for k in keys}, agg=agg)


class BatchBlock(Block):
    """Produce/propagate :class:`Batch` objects in-graph (reference
    ``block.py:578``): tensors/dicts become Batches; child modules returning
    dicts replace the features, children returning Batches replace the batch."""

    def forward(self, inputs, targets=None, sequences=None,
                batch: Optional[Batch] = None):
        if isinstance(batch, Batch):
            out = batch
        elif isinstance(inputs, Batch):
            out = inputs
        else:
            feats = inputs if isinstance(inputs, dict) else {"default": inputs}
            t = targets if isinstance(targets, dict) else (
                {"target": targets} if targets is not None else {}
            )
            out = Batch(features=dict(feats), targets=t,
                        sequences=sequences or TorchSequence())
        for module in self.values:
            res = _call(module, out.features, out)
            if isinstance(res, Batch):
                out = res
            elif isinstance(res, dict):
                out = Batch(features={**out.features, **res}, targets=out.targets,
                            sequences=out.sequences)
            else:
                raise RuntimeError("BatchBlock children must return Batch or dict")
        return out


class RouterBlock(ParallelBlock):
    """Schema-selection routing (reference ``torch/router.py``):
    ``add_route(selection, module)`` wires ``SelectKeys(selection) >> module``
    as a named branch."""

    def __init__(self, schema: Schema, agg=None):
        super().__init__({}, agg=agg)
        self.schema = schema

    def _select(self, selection) -> Schema:
        if isinstance(selection, Schema):
            return selection
        if isinstance(selection, (list, tuple)):
            return self.schema.select_by_name(list(selection))
        return self.schema.select_by_tag(selection)

    def add_route(self, selection, module: Optional[nn.Module] = None,
                  name: Optional[str] = None) -> "RouterBlock":
        sel = self._select(selection)
        branch = Block(SelectKeys(sel)) if module is None else Block(SelectKeys(sel), module)
        self.branches[name or str(getattr(selection, "value", selection))] = branch
        return self


class SelectFeatures(nn.Module):
    """Re-select RAW batch features mid-graph (reference
    ``inputs/select.py`` SelectFeatures — reads from the Batch, not the
    activations)."""

    def __init__(self, schema: Schema):
        super().__init__()
        self.names = list(schema.column_names)

    def forward(self, inputs, batch: Optional[Batch] = None):
        if batch is None:
            raise ValueError("SelectFeatures needs the threaded Batch")
        return {n: batch.features[n] for n in self.names if n in batch.features}


class CategoricalTarget(nn.Module):
    """Dense head over num_classes whose transposed kernel doubles as an
    embedding table (reference ``outputs/classification.py:205``)."""

    def __init__(self, col: ColumnSchema, in_dim: int):
        super().__init__()
        self.linear = nn.Linear(in_dim, col.cardinality)

    def forward(self, inputs, batch: Optional[Batch] = None):
        return self.linear(inputs)

    def embedding_lookup(self, ids: torch.Tensor) -> torch.Tensor:
        return self.linear.weight[ids.long()]


class EmbeddingTablePrediction(nn.Module):
    """Weight-tying head: logits = x @ table.weight.T (reference
    ``outputs/classification.py:301``)."""

    def __init__(self, table: EmbeddingTable):
        super().__init__()
        self.table = table

    def forward(self, inputs, batch: Optional[Batch] = None):
        return inputs @ self.table.table.weight.T


class TabularPadding(nn.Module):
    """Pad ragged sequence features to dense + masks (reference
    ``transforms/sequences.py`` TabularPadding). The shared Loader already
    emits padded values + masks, so this is a validating pass-through that
    materializes the Batch's sequence masks for downstream consumers."""

    def __init__(self, schema: Optional[Schema] = None):
        super().__init__()
        self.schema = schema

    def forward(self, inputs: Dict[str, torch.Tensor], batch: Optional[Batch] = None):
        return inputs


class BroadcastToSequence(nn.Module):
    """Broadcast 2-D context features along the sequence axis of 3-D features
    (reference ``transforms/sequences.py`` BroadcastToSequence)."""

    def __init__(self, context_schema: Schema, sequence_schema: Schema):
        super().__init__()
        self.context = set(context_schema.column_names)
        self.sequence = set(sequence_schema.column_names)

    def forward(self, inputs: Dict[str, torch.Tensor], batch: Optional[Batch] = None):
        L = None
        for name in self.sequence:
            if name in inputs and inputs[name].dim() >= 2:
                L = inputs[name].shape[1]
                break
        if L is None:
            raise ValueError("no sequence feature found to broadcast against")
        out = dict(inputs)
        for name in self.context:
            v = inputs.get(name)
            if v is None:
                continue
            if v.dim() == 1:
                v = v.unsqueeze(-1)
            if v.dim() == 2:
                out[name] = v.unsqueeze(1).expand(v.shape[0], L, v.shape[1])
        return out


def stack_context(model_dim: int, seq_selection=Tags.SEQUENCE):
    """Initializer that routes non-sequence context through embeddings +
    projection and stacks it with the sequence branch (reference
    ``inputs/tabular.py:135``). Returns a callable applied to a RouterBlock."""
    from .dsl import MLPBlock, Stack

    def init(block: RouterBlock):
        schema = block.schema
        seq = schema.select_by_tag(seq_selection)
        ctx = schema.excluding_by_name(seq.column_names)
        from .dsl import TabularInputBlock

        context = Block(TabularInputBlock(ctx, dim=model_dim, agg="concat"),
                        MLPBlock((model_dim,), _ctx_width(ctx, model_dim)))
        block.add_route(ctx, context, name="context")
        block.add_route(seq, TabularInputBlock(seq, dim=model_dim, agg="concat",
                                               seq_combiner="mean"), name="sequence")
        return block

    def _ctx_width(ctx, dim):
        from .dsl import TabularInputBlock

        return TabularInputBlock(ctx, dim=dim).out_dim

    return init


# schema helpers (input/output/feature/target + trace/select/extract) live in
# tracing.py — the reference's torch/schema.py analog.


# ---------------------------------------------------------------------------
# functional traversal (reference torch/functional.py map/walk)
# ---------------------------------------------------------------------------

def walk(module: nn.Module):
    """Yield every (sub)module, depth-first (reference ``functional.walk``)."""
    yield from module.modules()


def map(module: nn.Module, fn: Callable[[nn.Module], nn.Module]) -> nn.Module:  # noqa: A001
    """Apply ``fn`` to every submodule bottom-up, rebuilding containers
    (reference ``functional.map``). In-place on children, returns fn(root)."""
    for name, child in list(module.named_children()):
        setattr(module, name, map(child, fn))
    return fn(module)


# ---------------------------------------------------------------------------
# loaders + Dask-free batch prediction (reference models/base.py MultiLoader,
# predict.py DaskEncoder/DaskPredictor)
# ---------------------------------------------------------------------------

class MultiLoader:
    """Bundle train/valid/test datasets behind one object (reference
    ``MultiLoader:226`` — a LightningDataModule there; a plain container
    here, consumed by ``Model.fit(multi.train, ...)``)."""

    def __init__(self, train, valid=None, test=None, batch_size: int = 1024):
        from ..data.loader import Loader

        def as_loader(d):
            if d is None:
                return None
            return d if isinstance(d, Loader) else Loader(d, batch_size)

        self.train = as_loader(train)
        self.valid = as_loader(valid)
        self.test = as_loader(test)
        self.batch_size = batch_size


class DaskEncoder:
    """Batch-encode a dataset through a module (reference ``predict.py:138``
    runs Dask partitions; here the shared Loader streams batches — same
    contract, no Dask).

    With ``index=`` the result is a schema-carrying Dataset (the reference's
    encoded-dataframe shape, deduped by ``unique=``); without it, a plain
    ndarray of the concatenated outputs. ``selection`` narrows the forward
    inputs via :func:`~models_tpu.torch_backend.tracing.select_schema`."""

    def __init__(self, module: nn.Module, selection=None, batch_size: int = 1024):
        self.module = module
        self.selection = selection
        self.batch_size = batch_size

    def __call__(self, data, batch_size=None, index=None, unique: bool = True):
        from ..data.loader import Loader, ROW_VALID_KEY
        from .dsl import EncoderBlock

        batch_size = batch_size or self.batch_size
        if index is not None or self.selection is not None:
            enc = self.module if isinstance(self.module, EncoderBlock) else (
                EncoderBlock(self.module, schema=getattr(self.module, "schema", None))
            )
            return enc.encode(data, selection=self.selection,
                              batch_size=batch_size, index=index, unique=unique)
        loader = data if isinstance(data, Loader) else Loader(data, batch_size)
        chunks: List[np.ndarray] = []
        with torch.no_grad():
            for x, y in loader:
                batch = Batch.from_loader_batch(x, y)
                out = _call(self.module, batch.features, batch)
                if isinstance(out, dict):
                    out = torch.cat(
                        [v if v.dim() > 1 else v.unsqueeze(-1) for v in out.values()],
                        dim=-1,
                    )
                valid = np.asarray(x[ROW_VALID_KEY]) if ROW_VALID_KEY in x else None
                arr = out.numpy()
                chunks.append(arr[valid] if valid is not None else arr)
        return np.concatenate(chunks, axis=0)


class DaskPredictor(DaskEncoder):
    """Like :class:`DaskEncoder` but routes through a full model's heads and
    KEEPS the input features beside suffixed prediction columns (reference
    ``predict.py:439``)."""

    def __init__(self, module: nn.Module, prediction_suffix: str = "_prediction",
                 selection=None, batch_size: int = 1024):
        super().__init__(module, selection=selection, batch_size=batch_size)
        self.prediction_suffix = prediction_suffix

    def __call__(self, data, batch_size=None, index=None, unique: bool = True):
        from .dsl import EncoderBlock, Model

        batch_size = batch_size or self.batch_size
        if index is not None or self.selection is not None:
            enc = self.module if isinstance(self.module, EncoderBlock) else (
                EncoderBlock(self.module, schema=getattr(self.module, "schema", None))
            )
            return enc.predict(data, selection=self.selection,
                               batch_size=batch_size, index=index,
                               prediction_suffix=self.prediction_suffix,
                               unique=unique)
        if isinstance(self.module, Model):
            return self.module.predict(data, batch_size=batch_size)
        return DaskEncoder.__call__(self, data, batch_size=batch_size)
