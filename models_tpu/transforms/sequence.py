"""Sequence transforms for session-based models
(reference ``merlin/models/tf/transforms/sequence.py``).

Causal / masked-LM target preparation with **explicit masks** instead of the
reference's hidden ``_keras_mask`` side channel (SURVEY.md §7 hard-parts): every
transform returns ``(features, targets)`` where the target is a
:class:`SequenceFeature` whose mask marks the positions to predict. Shapes stay
static — positions are masked, never gathered into dynamic shapes.

Use as ``model.fit(..., pre=SequencePredictNext(schema, target="item_id_seq"))``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.block import Block
from ..core.types import MASK_KEY, ModelContext, SequenceFeature, TensorDict
from ..schema import ColumnSchema, Schema, Tags


def _as_seq(v) -> SequenceFeature:
    if isinstance(v, SequenceFeature):
        return v
    return SequenceFeature(v)


class SequenceTransform(Block):
    """Base: resolves the target sequence column (reference ``sequence.py:80``)."""

    def __init__(self, schema: Schema, target: Union[str, ColumnSchema, Tags]):
        if isinstance(target, Tags):
            target = schema.select_by_tag(target).first.name
        elif isinstance(target, ColumnSchema):
            target = target.name
        super().__init__(schema=schema)
        self.target = target
        self.seq_names = [c.name for c in schema if c.is_list]

    def _stash_mask(self, context, pred_mask):
        if context is not None:
            context[MASK_KEY] = pred_mask

    def __call__(self, inputs: TensorDict, *, targets=None, context=None, training=False, **kw):
        raise NotImplementedError


class SequencePredictNext(SequenceTransform):
    """Causal LM: inputs = x[:, :-1], target = x[:, 1:] (reference ``:222``).

    Static-shape version: sequences keep length L; the input mask drops the last
    valid position and the target is the sequence shifted left with the
    prediction mask marking positions whose *next* item exists.
    """

    def __call__(self, inputs, *, targets=None, context=None, training=False, **kw):
        out = dict(inputs)
        tgt_seq = _as_seq(inputs[self.target])
        # predict positions 0..n-2 (their next item); target at position t = x[t+1]
        shifted = jnp.roll(tgt_seq.values, -1, axis=1)
        pred_mask = tgt_seq.mask & jnp.roll(tgt_seq.mask, -1, axis=1)
        pred_mask = pred_mask.at[:, -1].set(False)
        for name in self.seq_names:
            v = _as_seq(out[name])
            # inputs lose their last valid position (it has no next-item target)
            out[name] = SequenceFeature(v.values, pred_mask | (v.mask & ~tgt_seq.mask))
        new_targets = SequenceFeature(shifted, pred_mask)
        self._stash_mask(context, pred_mask)
        if context is not None:
            context.targets = {self.target: new_targets}
        return out, {self.target: new_targets}


class SequencePredictLast(SequenceTransform):
    """Target = last valid item; inputs = everything before it (reference ``:349``)."""

    def __call__(self, inputs, *, targets=None, context=None, training=False, **kw):
        out = dict(inputs)
        tgt_seq = _as_seq(inputs[self.target])
        lengths = tgt_seq.lengths()
        last_idx = jnp.maximum(lengths - 1, 0)
        pos = jnp.arange(tgt_seq.values.shape[1])[None, :]
        input_mask = tgt_seq.mask & (pos < last_idx[:, None])
        last_vals = jnp.take_along_axis(tgt_seq.values, last_idx[:, None], axis=1)[:, 0]
        for name in self.seq_names:
            v = _as_seq(out[name])
            out[name] = SequenceFeature(v.values, input_mask)
        self._stash_mask(context, input_mask)
        if context is not None:
            context.targets = {self.target: last_vals}
        return out, {self.target: last_vals}


class SequencePredictRandom(SequenceTransform):
    """Random split per row: predict the item at a random valid position, condition
    on everything before it (reference ``:443``)."""

    def __init__(self, schema: Schema, target, seed: int = 0):
        super().__init__(schema, target)
        self.seed = seed

    def __call__(self, inputs, *, targets=None, context=None, training=False, **kw):
        out = dict(inputs)
        tgt_seq = _as_seq(inputs[self.target])
        lengths = tgt_seq.lengths()
        step = context.get("step", 0) if context is not None else 0
        key = jax.random.fold_in(jax.random.key(self.seed), jnp.asarray(step, jnp.int32))
        u = jax.random.uniform(key, (tgt_seq.values.shape[0],))
        # pick position in [1, len-1] (need at least one context item)
        max_pos = jnp.maximum(lengths - 1, 1)
        pick = 1 + (u * (max_pos - 1).astype(jnp.float32)).astype(jnp.int32)
        pick = jnp.minimum(pick, max_pos)
        pos = jnp.arange(tgt_seq.values.shape[1])[None, :]
        input_mask = tgt_seq.mask & (pos < pick[:, None])
        picked_vals = jnp.take_along_axis(tgt_seq.values, pick[:, None], axis=1)[:, 0]
        for name in self.seq_names:
            v = _as_seq(out[name])
            out[name] = SequenceFeature(v.values, input_mask)
        self._stash_mask(context, input_mask)
        if context is not None:
            context.targets = {self.target: picked_vals}
        return out, {self.target: picked_vals}


class SequenceTargetAsInput(SequenceTransform):
    """Keep the full sequence as both input and target (reference ``:549``);
    pair with a masking transform."""

    def __call__(self, inputs, *, targets=None, context=None, training=False, **kw):
        tgt_seq = _as_seq(inputs[self.target])
        new_targets = SequenceFeature(tgt_seq.values, tgt_seq.mask)
        if context is not None:
            context.targets = {self.target: new_targets}
        return dict(inputs), {self.target: new_targets}


class SequenceMaskRandom(SequenceTransform):
    """BERT-style MLM masking (reference ``:589``): each valid position is chosen
    for prediction with prob ``masking_prob`` (at least one per row); chosen
    positions become targets and are replaced by the [MASK] embedding downstream
    (:class:`ReplaceMaskedEmbeddings` reads the stashed mask from context)."""

    def __init__(self, schema: Schema, target, masking_prob: float = 0.2, seed: int = 0):
        super().__init__(schema, target)
        self.masking_prob = masking_prob
        self.seed = seed

    def __call__(self, inputs, *, targets=None, context=None, training=False, **kw):
        out = dict(inputs)
        tgt_seq = _as_seq(inputs[self.target])
        step = context.get("step", 0) if context is not None else 0
        key = jax.random.fold_in(jax.random.key(self.seed), jnp.asarray(step, jnp.int32))
        u = jax.random.uniform(key, tgt_seq.values.shape[:2])
        pred_mask = (u < self.masking_prob) & tgt_seq.mask
        # guarantee >= 1 masked position per (non-empty) row: mask the last valid
        lengths = tgt_seq.lengths()
        none_masked = (pred_mask.sum(axis=1) == 0) & (lengths > 0)
        last_idx = jnp.maximum(lengths - 1, 0)
        pos = jnp.arange(tgt_seq.values.shape[1])[None, :]
        force_last = none_masked[:, None] & (pos == last_idx[:, None])
        pred_mask = pred_mask | force_last
        new_targets = SequenceFeature(tgt_seq.values, pred_mask)
        self._stash_mask(context, pred_mask)
        if context is not None:
            context.targets = {self.target: new_targets}
        return out, {self.target: new_targets}


class SequenceMaskLast(SequenceTransform):
    """Mask only the last valid position (reference ``:804``) — the standard
    next-item *evaluation* protocol for MLM-trained models."""

    def __call__(self, inputs, *, targets=None, context=None, training=False, **kw):
        out = dict(inputs)
        tgt_seq = _as_seq(inputs[self.target])
        lengths = tgt_seq.lengths()
        last_idx = jnp.maximum(lengths - 1, 0)
        pos = jnp.arange(tgt_seq.values.shape[1])[None, :]
        pred_mask = tgt_seq.mask & (pos == last_idx[:, None])
        new_targets = SequenceFeature(tgt_seq.values, pred_mask)
        self._stash_mask(context, pred_mask)
        if context is not None:
            context.targets = {self.target: new_targets}
        return out, {self.target: new_targets}


class SequenceMaskLastInference(SequenceMaskLast):
    """Inference variant (reference ``:932``): positions after the last item are
    where the next-item prediction is read out; same mask mechanics."""


class ReplaceMaskedEmbeddings(Block):
    """Replace embeddings at to-be-predicted positions with a learned [MASK]
    vector (reference ``:967``). Place after the input block, before the
    transformer. Reads the prediction mask stashed in context by the masking
    transforms (or auto-recovered from SequenceFeature targets by
    ModelContext). Replaces whenever a mask is present — in eval too, matching
    the reference: the SequenceMaskLast protocol must hide the eval target from
    a bidirectional encoder."""

    def __init__(self):
        super().__init__()
        self.mask_embedding = nnx.data(None)

    def _ensure_built(self, dim):
        if self.mask_embedding is None:
            self.mask_embedding = nnx.Param(
                jax.random.truncated_normal(jax.random.key(11), -2, 2, (dim,)) * 0.05
            )

    def __call__(self, inputs, *, context=None, training=False, **kwargs):
        v = inputs
        mask = None
        if isinstance(v, SequenceFeature):
            v, mask = v.values, v.mask
        # build eagerly even without a mask: the model's build pass runs without
        # the masking pre-transform, but the param must exist before jit traces
        if not isinstance(v, jax.core.Tracer):
            self._ensure_built(v.shape[-1])
        pred_mask = context.get(MASK_KEY) if context is not None else None
        if pred_mask is None:
            return inputs
        if self.mask_embedding is None:
            raise RuntimeError("ReplaceMaskedEmbeddings not built; run an eager build pass")
        replaced = jnp.where(
            pred_mask[..., None], self.mask_embedding.value[None, None, :], v
        )
        if mask is not None:
            return SequenceFeature(replaced, mask)
        return replaced


class ExtractMaskFromTargets(Block):
    """Recover the prediction mask from a SequenceFeature target and stash it in
    context (reference ``:1068``) — lets eval pipelines skip the masking pre."""

    def __call__(self, inputs, *, targets=None, context=None, **kwargs):
        if context is not None and isinstance(targets, dict):
            for v in targets.values():
                if isinstance(v, SequenceFeature):
                    context[MASK_KEY] = v.mask
                    break
        elif context is not None and isinstance(targets, SequenceFeature):
            context[MASK_KEY] = targets.mask
        return inputs
