"""Model output heads.

Reference: ``merlin/models/tf/outputs/base.py`` (ModelOutput:38, DotProduct:291),
``outputs/classification.py`` (BinaryOutput:72, CategoricalOutput:127,
CategoricalTarget:220, EmbeddingTablePrediction:311 weight-tying),
``outputs/regression.py`` and ``outputs/block.py`` (OutputBlock:32,
ColumnBasedSampleWeight:193).

A head maps body output → logits and emits a :class:`Prediction` with the bound
target and sample weight. Heads carry their default loss name and default metric
factory; ``Model.compile`` resolves them per task.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import nnx

from ..blocks.mlp import Dense
from ..core.block import Block, as_block, call_block
from ..core.combinators import ParallelBlock
from ..core.types import Prediction, SequenceFeature
from ..metrics.base import AUC, BinaryAccuracy, LogLoss, Precision, Recall, RMSE
from ..metrics.topk import TopKMetricsAggregator
from ..schema import ColumnSchema, Schema, Tags


class LogitsTemperatureScaler(Block):
    """logits / T (reference ``transforms/bias.py:30``)."""

    def __init__(self, temperature: float):
        super().__init__()
        self.temperature = float(temperature)

    def __call__(self, inputs, **kwargs):
        return inputs / self.temperature


class ModelOutput(Block):
    """Head base: ``pre -> to_call -> post`` + target binding + Prediction wrap."""

    default_loss: str = "mse"

    def __init__(
        self,
        to_call=None,
        target: Optional[str] = None,
        pre=None,
        post=None,
        logits_temperature: float = 1.0,
        sample_weight_column: Optional[str] = None,
        task_name: Optional[str] = None,
    ):
        name = task_name or (f"{target}/{type(self).__name__}" if target else type(self).__name__)
        super().__init__(block_name=name)
        self.to_call = as_block(to_call) if to_call is not None else None
        self.target = target
        # nnx.data: these slots may be assigned a module later (OutputBlock
        # attaches task towers as `head.pre`) — a bare None would freeze them
        # as static attributes
        self.pre = as_block(pre) if pre is not None else nnx.data(None)
        self.post = as_block(post) if post is not None else nnx.data(None)
        self.logits_scaler = (
            LogitsTemperatureScaler(logits_temperature) if logits_temperature != 1.0 else None
        )
        self.sample_weight_column = sample_weight_column

    # ---- engine contract --------------------------------------------------
    def default_metrics(self) -> list:
        return []

    def bind_target(self, targets):
        if targets is None:
            return None
        if isinstance(targets, dict):
            if self.target is not None:
                return targets.get(self.target)
            if len(targets) == 1:
                return next(iter(targets.values()))
            return None
        return targets

    def activation(self, logits):
        """Map logits to user-facing predictions (identity by default)."""
        return logits

    def forward(self, inputs, *, training=False, context=None, targets=None):
        out = inputs
        # multi-task bodies (MMOE/PLE/CGC) emit dict task→tensor; pick ours
        if isinstance(out, dict) and self.target is not None and self.target in out:
            out = out[self.target]
        if self.pre is not None:
            out = call_block(self.pre, out, training=training, context=context, targets=targets)
        if self.to_call is not None:
            out = call_block(self.to_call, out, training=training, context=context)
        if self.logits_scaler is not None:
            out = self.logits_scaler(out)
        return out

    def __call__(self, inputs, *, training=False, context=None, targets=None, **kwargs):
        logits = self.forward(inputs, training=training, context=context, targets=targets)
        bound = self.bind_target(targets)
        sw = None
        if self.sample_weight_column is not None and context is not None:
            sw = context.features.get(self.sample_weight_column)
            if sw is not None:
                sw = sw.astype(jnp.float32)
        pred = Prediction(outputs=logits, targets=bound, sample_weight=sw)
        if self.post is not None:
            # post operates on the Prediction (e.g. ColumnBasedSampleWeight)
            pred = call_block(self.post, pred, training=training, context=context, targets=targets)
        return pred


class RegressionOutput(ModelOutput):
    """Linear regression head (reference ``regression.py:11``)."""

    default_loss = "mse"

    def __init__(self, target: Optional[str] = None, **kwargs):
        if isinstance(target, ColumnSchema):
            target = target.name
        super().__init__(to_call=Dense(1), target=target, **kwargs)

    def default_metrics(self):
        return [RMSE(name=self._metric_name("rmse"))]

    def _metric_name(self, base):
        return f"{self.target}/{base}" if self.target else base

    def activation(self, logits):
        return logits[..., 0] if logits.ndim > 1 and logits.shape[-1] == 1 else logits


class BinaryOutput(ModelOutput):
    """Binary classification head; emits logits, sigmoid applied at predict time
    (numerically-stable from-logits loss, unlike probability-space losses)."""

    default_loss = "binary_crossentropy"

    def __init__(self, target: Optional[str] = None, **kwargs):
        if isinstance(target, ColumnSchema):
            target = target.name
        super().__init__(to_call=Dense(1), target=target, **kwargs)

    def default_metrics(self):
        p = f"{self.target}/" if self.target else ""
        return [
            BinaryAccuracy(name=f"{p}binary_accuracy"),
            Precision(name=f"{p}precision"),
            Recall(name=f"{p}recall"),
            AUC(name=f"{p}auc"),
        ]

    def activation(self, logits):
        out = jax.nn.sigmoid(logits)
        return out[..., 0] if out.ndim > 1 and out.shape[-1] == 1 else out


class CategoricalTarget(Block):
    """Dense projection to num-classes logits (reference ``classification.py:220``)."""

    def __init__(self, num_classes: int, use_bias: bool = True, seed: int = 0):
        super().__init__()
        self.dense = Dense(num_classes, use_bias=use_bias, seed=seed)
        self.num_classes = num_classes

    def __call__(self, inputs, **kwargs):
        return self.dense(inputs)

    def embedding_lookup(self, ids):
        """Rows of the (transposed) kernel — class embeddings."""
        return jnp.take(self.dense.kernel.value.T, ids, axis=0)

    @property
    def embeddings(self):
        return self.dense.kernel.value.T


class EmbeddingTablePrediction(Block):
    """Weight-tying head: logits = x @ table.T (reference ``classification.py:311``)."""

    def __init__(self, table):
        super().__init__()
        self.table = table

    def __call__(self, inputs, *, training=False, context=None, **kwargs):
        if training and context is not None and context.get("taps") is not None:
            raise ValueError(
                "Full-catalog weight-tying softmax produces dense table gradients, "
                "incompatible with the row-sparse embedding optimizer. Use sampled "
                "softmax (ContrastiveOutput) or a dense optimizer for this table."
            )
        from ..core.policy import cast_compute

        if isinstance(inputs, SequenceFeature):
            inputs = inputs.values
        return jnp.matmul(
            cast_compute(inputs),
            cast_compute(self.table.embeddings).T,
            preferred_element_type=jnp.float32,
        )

    def embedding_lookup(self, ids, site: str = "tying", context=None):
        emb = self.table._lookup(ids, context=context)
        return self.table._tap(emb, ids, site, context)

    @property
    def embeddings(self):
        return self.table.embeddings

    @property
    def num_classes(self):
        return self.table.input_dim


class CategoricalOutput(ModelOutput):
    """Multi-class head over a categorical column; supports weight-tying with an
    EmbeddingTable (pass the table as ``to_call``)."""

    default_loss = "sparse_categorical_crossentropy"

    def __init__(
        self,
        to_call=None,
        target: Optional[str] = None,
        default_metrics_top_ks: Sequence[int] = (10,),
        **kwargs,
    ):
        from ..inputs.embedding import EmbeddingTable

        num_classes = None
        if isinstance(to_call, ColumnSchema):
            target = target or to_call.name
            num_classes = to_call.cardinality
            to_call = CategoricalTarget(num_classes)
        elif isinstance(to_call, EmbeddingTable):
            target = target or to_call.features[0]
            to_call = EmbeddingTablePrediction(to_call)
            num_classes = to_call.num_classes
        elif isinstance(to_call, int):
            num_classes = to_call
            to_call = CategoricalTarget(num_classes)
        self.num_classes = num_classes
        self.top_ks = tuple(default_metrics_top_ks)
        super().__init__(to_call=to_call, target=target, **kwargs)

    def default_metrics(self):
        return [TopKMetricsAggregator.default(k) for k in self.top_ks]

    def activation(self, logits):
        return jax.nn.softmax(logits, axis=-1)


class DotProduct(Block):
    """Row-wise dot of query/candidate branch outputs (reference ``base.py:291``)."""

    def __init__(self, query_name: str = "query", candidate_name: str = "candidate"):
        super().__init__()
        self.query_name = query_name
        self.candidate_name = candidate_name

    def __call__(self, inputs: dict, **kwargs):
        q = inputs[self.query_name]
        c = inputs[self.candidate_name]
        return jnp.sum(q * c, axis=-1, keepdims=True)


class ColumnBasedSampleWeight(Block):
    """Derive sample weights (or binary class weights) from a feature/target column
    (reference ``outputs/block.py:193``). Attach as a head's ``post``: rewrites the
    Prediction's sample_weight."""

    def __init__(
        self,
        weight_column_name: str,
        binary_class_weights: Optional[Tuple[float, float]] = None,
    ):
        super().__init__()
        self.weight_column_name = weight_column_name
        self.binary_class_weights = binary_class_weights

    def compute_weight(self, col):
        col = col.astype(jnp.float32)
        if self.binary_class_weights is not None:
            neg_w, pos_w = self.binary_class_weights
            return jnp.where(col > 0, pos_w, neg_w)
        return col

    def __call__(self, inputs, *, context=None, targets=None, **kwargs):
        col = None
        if context is not None:
            col = context.features.get(self.weight_column_name)
        if col is None and isinstance(targets, dict):
            col = targets.get(self.weight_column_name)
        if col is None:
            raise ValueError(f"Column {self.weight_column_name!r} not found for sample weights")
        w = self.compute_weight(col)
        if isinstance(inputs, Prediction):
            prev = inputs.sample_weight
            return inputs._replace(sample_weight=w if prev is None else w * prev)
        return inputs


def OutputBlock(
    schema: Schema,
    task_blocks: Optional[Dict[str, Block]] = None,
    logits_temperature: float = 1.0,
) -> Block:
    """Auto-build heads from TARGET-tagged columns (reference ``block.py:32``).

    Binary targets → :class:`BinaryOutput`; regression → :class:`RegressionOutput`;
    categorical int-domain targets → :class:`CategoricalOutput`. Multiple targets →
    ParallelBlock of heads (dict of Predictions), optionally with per-task towers.
    """
    targets = schema.targets
    if not len(targets):
        raise ValueError("Schema has no TARGET-tagged columns")

    heads: Dict[str, ModelOutput] = {}
    for col in targets:
        # task towers are passed through the constructor (not assigned after)
        # so the declarative config capture records them for save/load replay
        tower = (task_blocks or {}).get(col.name)
        kw = dict(logits_temperature=logits_temperature)
        if tower is not None:
            kw["pre"] = as_block(tower)
        if col.has_tag(Tags.REGRESSION) or (
            col.dtype.startswith("float") and not col.has_tag(Tags.BINARY_CLASSIFICATION)
        ):
            head = RegressionOutput(col.name, **kw)
        elif col.has_tag(Tags.MULTI_CLASS_CLASSIFICATION) and col.int_domain:
            head = CategoricalOutput(col, **kw)
        else:
            head = BinaryOutput(col.name, **kw)
        heads[head.block_name] = head

    if len(heads) == 1:
        return next(iter(heads.values()))
    return ParallelBlock(heads, block_name="output_block")
