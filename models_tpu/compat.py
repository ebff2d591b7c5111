"""Reference-namespace compatibility: every public symbol of
``merlin.models.tf`` that maps to an equivalent here but under a different
(usually V2-era) name, plus the small V1 config dataclasses. A user porting
code from the reference should find every name they `import` — pure aliases
carry the docstring pointer to the native construct.

(Keras/TF internals the reference re-exports — ``Layer``, ``Loss``,
``Optimizer``, ``configure_tensorflow`` — have no meaning on this stack and
are intentionally absent.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional, Union

import jax.numpy as jnp
import numpy as np

from .core.aggregation import (  # noqa: F401  (same names as the reference)
    ConcatFeatures,
    ElementwiseSum,
    ElementwiseSumItemMulti,
    StackFeatures,
)
from .core.block import Block
from .core.combinators import ParallelBlock
from .core.types import SequenceFeature
from .registry import aggregation_registry


def SequenceAggregator(combiner: str = "mean"):
    """Reference ``SequenceAggregator(combiner)`` (``aggregation.py:375``) →
    the registered ``sequence-<combiner>`` aggregation."""
    return aggregation_registry.parse(f"sequence-{combiner}")


# ---- V1 alias names --------------------------------------------------------

from .inputs.continuous import Continuous as ContinuousFeatures  # noqa: F401,E402
from .outputs.sampling import (  # noqa: F401,E402
    CandidateSampler as ItemSampler,
    InBatchSampler as InBatchSamplerV2,
    PopularityBasedSampler as PopularityBasedSamplerV2,
)
from .outputs.base import ModelOutput as PredictionTask  # noqa: F401,E402
from .outputs.topk import BruteForce as IndexBlock  # noqa: F401,E402
from .outputs.topk import BruteForce as TopKIndexBlock  # noqa: F401,E402
from .metrics.base import LogLoss as LogLossMetric  # noqa: F401,E402
from .transforms.features import PrepareFeatures as PrepareListFeatures  # noqa: F401,E402
from .models.retrieval import RetrievalModelV2 as RetrievalModel  # noqa: F401,E402
from .models.retrieval import (  # noqa: F401,E402
    YoutubeDNNRetrievalModel as YoutubeDNNRetrievalModelV2,
)
from .blocks.retrieval import QueryItemIdsEmbeddingsBlock  # noqa: F401,E402

from .outputs.tasks import ParallelPredictionBlock  # noqa: F401,E402

TabularBlock = ParallelBlock  # dict-in/dict-out block with pre/post/aggregation


def right_shift_layer(right, left):
    """The ``>>`` composition helper (reference ``tf/core/base.py:552``): a
    list/str/Tags left operand becomes a Filter selection, matching the
    reference's ``['col'] >> block`` idiom."""
    from .core.block import as_block
    from .core.combinators import Filter, SequentialBlock
    from .schema import Tags

    if isinstance(left, (list, tuple, str, Tags)) and not isinstance(left, Block):
        left = Filter(left)
    return SequentialBlock([as_block(left), as_block(right)])


def is_transformers_available() -> bool:
    """The session transformer stack here is native (no HF dependency) — it is
    always available; kept for reference API parity."""
    return True


# ---- small V1 config dataclasses ------------------------------------------

class EmbeddingWithMetadata(NamedTuple):
    """(reference ``EmbeddingWithMetadata``): embeddings + their metadata df."""

    embeddings: jnp.ndarray
    metadata: dict


@dataclass
class TableConfig:
    """V1 table config (reference imports this from tf.tpu — fitting, since
    this IS a TPU stack; ``tf/inputs/embedding.py:25``)."""

    vocabulary_size: int
    dim: int
    initializer: Optional[Callable] = None
    combiner: Optional[str] = "mean"
    name: Optional[str] = None


@dataclass
class FeatureConfig:
    table: TableConfig
    max_sequence_length: int = 0
    name: Optional[str] = None


@dataclass
class EmbeddingOptions:
    """V1 embedding options (reference ``tf/inputs/embedding.py:932``) —
    convertible to ``Embeddings()`` keyword arguments."""

    embedding_dims: Optional[dict] = None
    embedding_dim_default: Optional[int] = 64
    infer_embedding_sizes: bool = False
    infer_embedding_sizes_multiplier: float = 2.0
    embeddings_l2_reg: float = 0.0

    def to_kwargs(self) -> dict:
        dim: Union[int, dict, None]
        if self.infer_embedding_sizes:
            dim = self.embedding_dims  # per-name overrides; rest inferred
        elif self.embedding_dims:
            # reference semantics (embedding.py:1057): unlisted columns get
            # embedding_dim_default, not cardinality inference
            dim = _DimDict(self.embedding_dims, self.embedding_dim_default or 64)
        else:
            dim = self.embedding_dim_default
        return {
            "dim": dim,
            "infer_dim_multiplier": self.infer_embedding_sizes_multiplier,
            "l2_reg": self.embeddings_l2_reg,
        }


class _DimDict(dict):
    """Per-name dims with a default for unlisted names (EmbeddingOptions)."""

    def __init__(self, base, default):
        super().__init__(base)
        self.default = int(default)

    def __contains__(self, key):
        return True

    def __missing__(self, key):
        return self.default


class TensorInitializer:
    """Initializer returning a fixed tensor (reference ``tf_utils.py:389``) —
    usable as ``EmbeddingTable(initializer=TensorInitializer(arr))``. The only
    accepted shape difference is the table's multiple-of-8 row padding."""

    def __init__(self, value):
        self.value = np.asarray(value)

    def __call__(self, key, shape, dtype=jnp.float32):
        arr = jnp.asarray(self.value, dtype)
        if tuple(shape) == tuple(arr.shape):
            return arr
        if (
            arr.ndim != len(shape)
            or tuple(arr.shape[1:]) != tuple(shape[1:])
            or arr.shape[0] > shape[0]
            or shape[0] - arr.shape[0] >= 8
        ):
            raise ValueError(
                f"TensorInitializer value shape {tuple(arr.shape)} does not match "
                f"table shape {tuple(shape)} (only multiple-of-8 row padding differs)"
            )
        out = jnp.zeros(shape, dtype)
        return out.at[: arr.shape[0]].set(arr)


# ---- ToDense / ToSparse / ToOneHot ----------------------------------------

class ToDense(Block):
    """SequenceFeatures → padded dense values (mask dropped; reference
    ``features.py:84`` densifies ragged/sparse tensors)."""

    def __call__(self, inputs, **kwargs):
        if isinstance(inputs, SequenceFeature):
            return inputs.values
        if isinstance(inputs, dict):
            return {
                k: v.values if isinstance(v, SequenceFeature) else v
                for k, v in inputs.items()
            }
        return inputs


class ToSparse(Block):
    """Identity: :class:`SequenceFeature` (padded values + mask) is the one
    list encoding on TPU — there is no sparse tensor type to convert to."""

    def __call__(self, inputs, **kwargs):
        return inputs


class ToOneHot(Block):
    """Scalar int targets/features → one-hot by schema cardinality (reference
    ``prediction_tasks/classification.py`` input prep)."""

    def __init__(self, num_classes: int):
        super().__init__()
        self.num_classes = int(num_classes)

    def __call__(self, inputs, **kwargs):
        import jax

        if isinstance(inputs, dict):
            return {k: jax.nn.one_hot(v, self.num_classes) for k, v in inputs.items()}
        return jax.nn.one_hot(inputs, self.num_classes)
