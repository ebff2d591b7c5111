"""Feature transforms (reference ``merlin/models/tf/transforms/features.py``).

Notable TPU deviations: no sparse tensors — ``CategoryEncoding`` emits dense
one-hot/multi-hot/count tensors (XLA scatters them efficiently and the wide-path
matmul over a dense multi-hot is MXU-friendly); ragged prep lives in the Loader
(``PrepareFeatures`` here only normalizes shapes/dtypes for raw dict feeds).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ..core.block import Block
from ..core.types import SequenceFeature, TensorDict
from ..schema import ColumnSchema, Schema, Tags


class PrepareFeatures(Block):
    """Normalize a raw host batch to model-ready tensors
    (reference ``PrepareFeatures:141``): casts dtypes per schema; scalar continuous
    stay (B,), list features must already be ``SequenceFeature`` (Loader output) or
    ``(values, offsets)`` tuples which are padded here."""

    def __init__(self, schema: Schema):
        super().__init__(schema=schema)

    def __call__(self, inputs: TensorDict, **kwargs):
        out = dict(inputs)
        for col in self.schema:
            v = out.get(col.name)
            if v is None:
                continue
            if isinstance(v, tuple) and len(v) == 2:
                out[col.name] = SequenceFeature.from_values_offsets(
                    v[0], v[1], col.max_seq_length or 1
                )
            elif col.is_list and not isinstance(v, SequenceFeature) and hasattr(v, "ndim") and v.ndim >= 2:
                out[col.name] = SequenceFeature(v)
        return out


class ToTarget(Block):
    """Move schema columns from features into targets (reference ``:1008``)."""

    def __init__(self, schema: Schema, *columns: Union[str, Tags, ColumnSchema]):
        names: List[str] = []
        for c in columns:
            if isinstance(c, ColumnSchema):
                names.append(c.name)
            elif isinstance(c, Tags):
                names.extend(schema.select_by_tag(c).column_names)
            else:
                names.append(str(c))
        super().__init__(schema=schema.select_by_name(names))
        self.names = names

    def __call__(self, inputs: TensorDict, *, context=None, targets=None, **kwargs):
        out = dict(inputs)
        new_targets = dict(targets) if isinstance(targets, dict) else {}
        for n in self.names:
            if n in out:
                new_targets[n] = out.pop(n)
        if context is not None:
            context.targets = new_targets
        return out

    def transform_schema(self, schema: Schema) -> Schema:
        return schema.map(
            lambda c: c.with_tags(Tags.TARGET) if c.name in self.names else c
        )


class CategoryEncoding(Block):
    """Dense one-hot / multi-hot / count encodings for wide models
    (reference ``CategoryEncoding:470``). Output (B, Σ cardinalities)."""

    def __init__(self, schema: Schema, output_mode: str = "multi_hot"):
        super().__init__(schema=schema.categorical)
        if output_mode not in ("one_hot", "multi_hot", "count"):
            raise ValueError(f"Unknown output_mode {output_mode!r}")
        self.output_mode = output_mode
        self.cardinalities = {c.name: c.cardinality for c in self.schema}

    def _encode(self, col: ColumnSchema, v):
        card = self.cardinalities[col.name]
        if isinstance(v, SequenceFeature):
            onehot = jax.nn.one_hot(v.values, card) * v.mask[..., None]
            agg = jnp.sum(onehot, axis=1)
            if self.output_mode != "count":
                agg = jnp.minimum(agg, 1.0)
            return agg
        out = jax.nn.one_hot(v.reshape(v.shape[0], -1), card)
        out = jnp.sum(out, axis=1)
        if self.output_mode != "count":
            out = jnp.minimum(out, 1.0)
        return out

    def __call__(self, inputs: TensorDict, **kwargs):
        encoded = [
            self._encode(col, inputs[col.name]) for col in self.schema if col.name in inputs
        ]
        if not encoded:
            raise ValueError("CategoryEncoding found none of its columns in inputs")
        return jnp.concatenate(encoded, axis=-1)


def _hash_combine(h, v):
    # simple mixing (splitmix-ish) — deterministic across runs, vectorized on VPU
    h = h ^ (v + jnp.uint32(0x9E3779B9) + (h << 6) + (h >> 2))
    return h


class HashedCross(Block):
    """Hashed cross of N categorical features into ``num_bins`` buckets
    (reference ``HashedCross:694``). Output int bucket ids (B,) or one-hot.

    List features are supported (the reference crosses sparse/ragged inputs,
    ``tf/transforms/features.py:694``): list×list crosses positionwise, a
    scalar broadcasts along the sequence axis, and the output is a
    :class:`SequenceFeature` whose mask is the AND of the input masks."""

    def __init__(self, schema: Schema, num_bins: int = 1000, output_mode: str = "int",
                 output_name: Optional[str] = None):
        super().__init__(schema=schema.categorical)
        self.num_bins = num_bins
        self.output_mode = output_mode
        self.output_name = output_name or ("cross_" + "_".join(self.schema.column_names))

    def __call__(self, inputs: TensorDict, **kwargs):
        vals = []
        mask = None
        seq_len = None
        for col in self.schema:
            v = inputs[col.name]
            if isinstance(v, SequenceFeature):
                if seq_len is not None and v.values.shape[1] != seq_len:
                    raise ValueError(
                        "HashedCross list features must share one sequence length"
                    )
                seq_len = v.values.shape[1]
                mask = v.mask if mask is None else (mask & v.mask)
                vals.append(v.values)
            else:
                vals.append(v)
        h = jnp.full((), 0x811C9DC5, dtype=jnp.uint32)
        first = True
        for v in vals:
            v = v.astype(jnp.uint32)
            if seq_len is not None and v.ndim == 1:
                v = jnp.broadcast_to(v[:, None], (v.shape[0], seq_len))
            h = _hash_combine(jnp.broadcast_to(h, v.shape) if first else h, v)
            first = False
        bucket = (h % jnp.uint32(self.num_bins)).astype(jnp.int32)
        if seq_len is not None:
            if mask is not None:
                # masked positions hash to bucket 0 deterministically
                bucket = jnp.where(mask, bucket, 0)
            out_vals = (
                jax.nn.one_hot(bucket, self.num_bins)
                if self.output_mode == "one_hot"
                else bucket
            )
            return SequenceFeature(
                out_vals,
                mask if mask is not None else jnp.ones(bucket.shape, bool),
            )
        if self.output_mode == "one_hot":
            return jax.nn.one_hot(bucket, self.num_bins)
        return bucket


def HashedCrossAll(
    schema: Schema,
    num_bins: int = 1000,
    max_level: int = 2,
    min_level: int = 2,
    output_mode: str = "one_hot",
    ignore_combinations: Sequence[Sequence[str]] = (),
) -> Block:
    """All feature crosses of size [min_level, max_level] (reference ``:904``)."""
    import itertools

    from ..core.block import Block as _B

    cols = schema.categorical.column_names
    ignore = {tuple(sorted(c)) for c in ignore_combinations}
    crosses = []
    for level in range(min_level, max_level + 1):
        for combo in itertools.combinations(cols, level):
            if tuple(sorted(combo)) in ignore:
                continue
            crosses.append(HashedCross(schema.select_by_name(list(combo)), num_bins, output_mode))

    class _AllCrosses(Block):
        def __init__(self):
            super().__init__(schema=schema.categorical)
            from flax import nnx

            self.crosses = nnx.List(crosses)

        def __call__(self, inputs, **kwargs):
            outs = [c(inputs) for c in self.crosses]
            if output_mode == "one_hot":
                return jnp.concatenate(outs, axis=-1)
            return jnp.stack(outs, axis=-1)

    return _AllCrosses()


class BroadcastToSequence(Block):
    """Broadcast 2-D context features to the 3-D sequence shape
    (reference ``:1118``): context (B, D) → (B, L, D) using the sequence schema's mask."""

    def __init__(self, context_schema: Schema, sequence_schema: Schema):
        super().__init__(schema=context_schema + sequence_schema)
        self.context_names = set(context_schema.column_names)
        self.sequence_names = set(sequence_schema.column_names)

    def __call__(self, inputs: TensorDict, **kwargs):
        # find a reference mask
        mask = None
        for n in self.sequence_names:
            v = inputs.get(n)
            if isinstance(v, SequenceFeature):
                mask = v.mask
                break
        if mask is None:
            raise ValueError("BroadcastToSequence found no SequenceFeature to take length from")
        L = mask.shape[1]
        out = dict(inputs)
        for n in self.context_names:
            v = out.get(n)
            if v is None or isinstance(v, SequenceFeature):
                continue
            if v.ndim == 1:
                v = v[:, None]
            out[n] = SequenceFeature(jnp.repeat(v[:, None, :], L, axis=1), mask)
        return out


class ExpandDims(Block):
    """dict-wise expand_dims (reference ``transforms/tensor.py:30``)."""

    def __init__(self, axis: int = -1):
        super().__init__()
        self.axis = axis

    def __call__(self, inputs, **kwargs):
        if isinstance(inputs, dict):
            return {k: jnp.expand_dims(v, self.axis) if not isinstance(v, SequenceFeature) else v
                    for k, v in inputs.items()}
        return jnp.expand_dims(inputs, self.axis)
