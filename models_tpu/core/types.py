"""Core value types flowing through models.

The reference leans on ``tf.RaggedTensor`` plus a hidden ``_keras_mask`` side-channel
(``merlin/models/tf/models/base.py:863-1075``). XLA wants static shapes, so the TPU-native
design makes the mask explicit: a list/sequence feature is a :class:`SequenceFeature`
pytree of ``(values, mask)`` where ``values`` is padded to the schema's static max length.
``values/offsets`` ragged encoding exists only at the host boundary (the data loader).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class SequenceFeature:
    """A padded sequence feature: ``values`` (B, L, ...) + boolean ``mask`` (B, L).

    Replaces tf.RaggedTensor (reference ``transforms/features.py:141-410``): static
    shapes for XLA, explicit mask instead of Keras' hidden side-channel.
    """

    __slots__ = ("values", "mask")

    def __init__(self, values, mask=None):
        self.values = values
        if mask is None:
            mask = jnp.ones(values.shape[:2], dtype=bool)
        self.mask = mask

    # pytree protocol
    def tree_flatten(self):
        return (self.values, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        # bypass __init__: transforms may pass None/placeholder leaves
        obj = object.__new__(cls)
        obj.values, obj.mask = children
        return obj

    # ---- convenience -------------------------------------------------------
    @property
    def shape(self):
        return self.values.shape

    @property
    def dtype(self):
        return self.values.dtype

    def lengths(self):
        return jnp.sum(self.mask.astype(jnp.int32), axis=1)

    def with_values(self, values) -> "SequenceFeature":
        return SequenceFeature(values, self.mask)

    def with_mask(self, mask) -> "SequenceFeature":
        return SequenceFeature(self.values, mask)

    def masked(self, fill=0):
        """values with padded positions replaced by ``fill``."""
        m = self.mask
        while m.ndim < self.values.ndim:
            m = m[..., None]
        return jnp.where(m, self.values, fill)

    @classmethod
    def from_values_offsets(cls, values, offsets, max_len: int) -> "SequenceFeature":
        """Host-side: build padded (B, max_len) array from ragged values/offsets."""
        values = np.asarray(values)
        offsets = np.asarray(offsets)
        batch = len(offsets) - 1
        out = np.zeros((batch, max_len) + values.shape[1:], dtype=values.dtype)
        mask = np.zeros((batch, max_len), dtype=bool)
        for i in range(batch):
            s, e = offsets[i], offsets[i + 1]
            n = min(e - s, max_len)
            out[i, :n] = values[s : s + n]
            mask[i, :n] = True
        return cls(out, mask)

    def __repr__(self):
        return f"SequenceFeature(values={self.values.shape}, mask={self.mask.shape})"


TensorLike = Union[jnp.ndarray, SequenceFeature]
TensorDict = Dict[str, TensorLike]


class Prediction(NamedTuple):
    """Output of a model head (reference ``tf/core/prediction.py:54``).

    ``label_relevant_counts`` is the corpus-eval side channel (reference
    ``tf/metrics/topk.py:187-208``): when targets are truncated to top-k
    relevance, it carries the true number of relevant items per row.
    """

    outputs: Any
    targets: Any = None
    sample_weight: Any = None
    negative_candidate_ids: Any = None
    label_relevant_counts: Any = None
    # set by fused-loss heads (flash-style blockwise CE): the engine uses this
    # scalar directly instead of applying a loss fn to outputs/targets
    precomputed_loss: Any = None

    @property
    def predictions(self):
        return self.outputs


class TopKPrediction(NamedTuple):
    """Scores + ids from a top-k layer (reference ``tf/core/prediction.py:86``)."""

    scores: jnp.ndarray  # (B, k)
    identifiers: jnp.ndarray  # (B, k)

    def with_k(self, k: int) -> "TopKPrediction":
        return TopKPrediction(self.scores[:, :k], self.identifiers[:, :k])

    def to_df(self):
        """Export to a Dataset with per-row top-k id/score list columns
        (reference ``TopKPrediction.to_df`` — feeds offline recommendation dumps)."""
        from ..data.dataset import Dataset

        ids = np.asarray(self.identifiers)
        scores = np.asarray(self.scores)
        return Dataset(
            {
                "top_ids": np.asarray(ids, dtype=np.int64),
                "top_scores": np.asarray(scores, dtype=np.float32),
            }
        )


MASK_KEY = "__sequence_prediction_mask__"


def prediction_mask_from_targets(targets):
    """Recover the sequence prediction mask from SequenceFeature targets (the
    in-graph equivalent of the reference's ``ExtractMaskFromTargets``,
    ``tf/transforms/sequence.py:1068``)."""
    if isinstance(targets, SequenceFeature):
        return targets.mask
    if isinstance(targets, dict):
        for v in targets.values():
            if isinstance(v, SequenceFeature):
                return v.mask
    return None


class ModelContext(dict):
    """Mutable shared context threaded through a forward pass.

    Carries raw input features (for heads that need ids, e.g. contrastive
    false-negative masking), per-call masks, and cached intermediate values
    (e.g. query embeddings for corpus eval). Mirrors the reference's
    ``ModelContext``/``PredictionContext`` (``tf/core/base.py:44``,
    ``tf/core/prediction.py:25``) without the Keras variable store.

    Construction recovers the sequence prediction mask from SequenceFeature
    targets: the jitted train/eval steps build a fresh context each call, so
    masks stashed by a ``pre`` transform in the host-side context would
    otherwise never reach in-graph consumers like ReplaceMaskedEmbeddings.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if MASK_KEY not in self:
            m = prediction_mask_from_targets(self.get("targets"))
            if m is not None:
                self[MASK_KEY] = m

    @property
    def features(self) -> TensorDict:
        return self.get("features", {})

    @features.setter
    def features(self, value: TensorDict):
        self["features"] = value

    @property
    def targets(self):
        return self.get("targets")

    @targets.setter
    def targets(self, value):
        self["targets"] = value

    @property
    def mask(self):
        return self.get("mask")

    @mask.setter
    def mask(self, value):
        self["mask"] = value


def to_device_batch(host_batch: Dict[str, Any]) -> TensorDict:
    """numpy host batch -> jnp arrays (SequenceFeature passes through)."""
    out: TensorDict = {}
    for name, val in host_batch.items():
        if isinstance(val, SequenceFeature):
            out[name] = SequenceFeature(jnp.asarray(val.values), jnp.asarray(val.mask))
        else:
            out[name] = jnp.asarray(val)
    return out
