"""Embedding tables and the schema-driven ``Embeddings()`` factory.

Reference: ``merlin/models/tf/inputs/embedding.py`` (EmbeddingTable:153,
Embeddings:585). TPU-native differences:

- tables are ``nnx.Param`` matrices with row counts from the schema's static
  cardinalities — XLA sees fixed shapes;
- lookups are ``jnp.take`` (XLA dynamic-gather) on one chip; the mesh-sharded path
  (``models_tpu/parallel``) re-annotates the same tables with ``NamedSharding`` row
  sharding and swaps in the bucketed all_to_all lookup (``ops/embedding_lookup.py
  a2a_lookup``, psum fallback for non-dividing batches) — no user-facing change;
- multi-hot/sequence features arrive as :class:`SequenceFeature` (padded + mask);
  combiners are mask-aware means/sums, never ragged ops;
- shared tables: columns with the same int-domain name share one table, exactly like
  the reference's shared-embedding convention.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..core.aggregation import SEQUENCE_COMBINERS
from ..core.block import Block
from ..core.combinators import ParallelBlock
from ..core.types import SequenceFeature, TensorDict
from ..schema import ColumnSchema, Schema, Tags, infer_embedding_dim


def _normal_init(key, shape, dtype=jnp.float32, stddev: float = 0.05):
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * stddev


class EmbeddingParam(nnx.Param):
    """Param subclass marking embedding-table weights.

    Lets the engine split table params from dense params (``nnx.split(model,
    EmbeddingParam, nnx.Param, ...)``) so tables can take row-sparse optimizer
    updates (``blocks/optimizer.py``) instead of dense full-table updates — the
    HBM-traffic difference between touching ~batch rows and rewriting the whole
    table every step."""


class EmbeddingTable(Block):
    """A single embedding table, optionally serving several features.

    ``dim``: embedding width. ``col_schema``: one or more columns (all sharing the
    table's domain). Scalar id input → (B, dim); SequenceFeature input → (B, L, dim)
    or combined (B, dim) when ``sequence_combiner`` is set.
    """

    def __init__(
        self,
        dim: int,
        col_schema: Union[ColumnSchema, Sequence[ColumnSchema]],
        sequence_combiner: Optional[str] = None,
        trainable: bool = True,
        initializer: Union[str, Callable, None] = None,
        weights: Optional[np.ndarray] = None,
        l2_reg: float = 0.0,
        dtype=jnp.float32,
        seed: int = 0,
    ):
        cols = [col_schema] if isinstance(col_schema, ColumnSchema) else list(col_schema)
        super().__init__(schema=Schema(cols), block_name=cols[0].domain_name)
        self.dim = int(dim)
        self.features = [c.name for c in cols]
        self.sequence_combiner = sequence_combiner
        self.trainable = trainable
        self.l2_reg = l2_reg
        card = cols[0].cardinality
        if card is None:
            raise ValueError(f"Column {cols[0].name} has no cardinality; cannot embed")
        for c in cols[1:]:
            if c.cardinality != card:
                raise ValueError(
                    f"Features sharing an embedding table must share its domain: "
                    f"{c.name} has cardinality {c.cardinality} != {cols[0].name}'s {card}"
                )
        self.input_dim = int(card)
        # pad rows to a multiple of 8: keeps the table tileable on TPU and evenly
        # row-shardable across small mesh axes; phantom rows never surface (the
        # `embeddings` property slices them off)
        self.padded_rows = -(-self.input_dim // 8) * 8

        if weights is not None:
            weights = jnp.asarray(weights, dtype=dtype)
            if weights.shape != (self.input_dim, self.dim):
                raise ValueError(
                    f"Pretrained weights {weights.shape} != ({self.input_dim}, {self.dim})"
                )
            value = jnp.zeros((self.padded_rows, self.dim), dtype=dtype).at[: self.input_dim].set(weights)
        else:
            if callable(initializer):
                value = initializer(jax.random.key(seed), (self.padded_rows, self.dim), dtype)
            else:
                value = _normal_init(jax.random.key(seed), (self.padded_rows, self.dim), dtype)
        self.table = EmbeddingParam(value) if trainable else nnx.Variable(value)
        # sparse-optimizer support (set up by the engine when compile() requests a
        # row-sparse embedding optimizer): slots live beside the table
        self.sparse_slots = nnx.data(None)
        self._tap_key: Optional[str] = None

    # ------------------------------------------------------------------
    @classmethod
    def from_pretrained(
        cls,
        data: Union[np.ndarray, "object"],
        col_schema: Optional[ColumnSchema] = None,
        trainable: bool = True,
        name: str = "pretrained",
        sequence_combiner: Optional[str] = None,
    ) -> "EmbeddingTable":
        """Build from a (cardinality, dim) array (reference ``embedding.py:282``)."""
        arr = np.asarray(data)
        if col_schema is None:
            from ..schema import create_categorical_column

            col_schema = create_categorical_column(name, arr.shape[0] - 1)
        return cls(
            dim=arr.shape[1],
            col_schema=col_schema,
            weights=arr,
            trainable=trainable,
            sequence_combiner=sequence_combiner,
        )

    @property
    def embeddings(self) -> jnp.ndarray:
        return self.table.value[: self.input_dim]

    def to_array(self) -> np.ndarray:
        return np.asarray(self.table.value[: self.input_dim])

    def to_dataset(self):
        """Export (id, embedding) rows (reference ``to_df/to_dataset`` :351-379)."""
        from ..data.dataset import Dataset

        emb = self.to_array()
        data = {"id": np.arange(emb.shape[0], dtype=np.int64), "embedding": emb}
        return Dataset(data)

    # ------------------------------------------------------------------
    def _lookup(self, ids: jnp.ndarray, context=None) -> jnp.ndarray:
        """Gather rows. Under ``fit(mesh=)`` with a model axis that divides this
        table's (padded) rows — the same condition the placement rules use to
        row-shard it — the lookup routes through :func:`sharded_lookup` so the
        table is never all-gathered (the SOK-equivalent path, reference
        ``tf/distributed/embedding.py:144``); otherwise it is XLA's dynamic
        gather on the local/replicated table."""
        mesh = context.get("mesh") if context is not None else None
        if mesh is not None:
            from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

            n = dict(mesh.shape).get(MODEL_AXIS, 1)
            if n > 1 and self.padded_rows % n == 0:
                from ..ops.embedding_lookup import sharded_lookup

                flat = ids.reshape(-1)
                out = sharded_lookup(
                    self.table.value, flat, mesh, axis=MODEL_AXIS, data_axis=DATA_AXIS
                )
                return self._cast_up(out.reshape(tuple(ids.shape) + (self.dim,)))
        return self._cast_up(jnp.take(self.table.value, ids, axis=0))

    def _cast_up(self, emb: jnp.ndarray) -> jnp.ndarray:
        """Low-precision tables (bf16 at rest, stochastic-rounding updates) cast
        gathered rows to the policy compute dtype, so activations and tap
        gradients keep master quality regardless of the at-rest width."""
        if emb.dtype == jnp.float32:
            return emb
        from ..core.policy import compute_dtype

        return emb.astype(compute_dtype())

    def _tap(self, emb, ids, feature, context):
        """Sparse-training hook: inject the zero 'tap' tensor so the engine can
        take gradients w.r.t. the *gathered rows* (not the full table), and
        record the looked-up ids for the row-sparse scatter update."""
        if context is None or self._tap_key is None:
            return emb
        key = f"{self._tap_key}:{feature}" if feature else self._tap_key
        shapes = context.get("collect_tap_shapes")
        if shapes is not None:
            shapes[key] = tuple(emb.shape)
        taps = context.get("taps")
        if taps is not None and key in taps:
            emb = emb + taps[key]
            context.setdefault("tap_ids", {})[key] = ids
        return emb

    def _call_single(self, value, feature: Optional[str] = None, context=None):
        if isinstance(value, SequenceFeature):
            emb = self._lookup(value.values, context=context)  # (B, L, D)
            emb = self._tap(emb, value.values, feature, context)
            combiner = self.sequence_combiner
            if combiner is None:
                return SequenceFeature(emb, value.mask)
            masked = SequenceFeature(emb, value.mask)
            return SEQUENCE_COMBINERS[combiner](masked)
        emb = self._lookup(value, context=context)
        return self._tap(emb, value, feature, context)

    def __call__(self, inputs, *, context=None, **kwargs):
        if isinstance(inputs, dict):
            return {
                name: self._call_single(inputs[name], feature=name, context=context)
                for name in self.features
                if name in inputs
            }
        return self._call_single(inputs, feature=self.features[0], context=context)

    def regularization_loss(self) -> jnp.ndarray:
        if not self.l2_reg:
            return jnp.zeros(())
        return self.l2_reg * jnp.sum(jnp.square(self.table.value))

    def __repr__(self):
        return f"EmbeddingTable({self.input_dim}x{self.dim}, features={self.features})"


def Embeddings(
    schema: Schema,
    dim: Union[int, Dict[str, int], None] = None,
    sequence_combiner: Union[str, Dict[str, Optional[str]], None] = "default",
    trainable: Union[bool, Dict[str, bool]] = True,
    infer_dim_multiplier: float = 2.0,
    l2_reg: float = 0.0,
    table_kwargs: Optional[Dict[str, dict]] = None,
    param_dtype=None,
    seed: int = 0,
    fused: bool = False,
    tt_compression_threshold: Optional[int] = None,
    tt_ranks: Union[int, tuple] = 32,
    dynamic: Union[bool, Dict[str, bool]] = False,
    dynamic_capacity: Optional[Dict[str, int]] = None,
) -> ParallelBlock:
    """One :class:`EmbeddingTable` per categorical domain (reference ``:585``).

    - ``dim``: int for all tables, dict per column/domain name, or None to infer
      via the cardinality**0.25 heuristic;
    - ``sequence_combiner="default"``: list columns tagged ``SEQUENCE`` stay 3-D
      (session models); other list columns are mean-pooled (multi-hot);
    - columns sharing an int-domain name share one table;
    - ``tt_compression_threshold``: domains with cardinality above it use
      tensor-train compressed tables (TT-Rec, :class:`TTEmbeddingTable`) —
      100s-of-x less HBM for giant catalogs at the cost of two small extra
      matmuls per lookup;
    - ``param_dtype=jnp.bfloat16``: tables stored bfloat16 at rest (half the
      HBM and half the gather/update traffic; doubles the max catalog size).
      Requires a sparse ``embedding_optimizer`` — updates are written back
      with stochastic rounding so training quality holds (lookups cast up to
      the policy compute dtype);
    - ``dynamic``: route domains through :class:`DynamicEmbeddingTable`
      (device-resident id→slot hash map; unseen ids allocate rows mid-fit —
      the ``sok.DynamicVariable`` analog). ``True`` for all domains or a
      per-domain dict; ``dynamic_capacity`` overrides the per-domain row
      budget (default: cardinality / 0.8).
    """
    cat = schema.categorical
    if not len(cat):
        raise ValueError("Schema has no categorical columns")

    by_domain: Dict[str, list] = {}
    for col in cat:
        by_domain.setdefault(col.domain_name, []).append(col)

    def _dim_for(domain: str, cols) -> int:
        if isinstance(dim, dict):
            for c in cols:
                if c.name in dim:
                    return dim[c.name]
            if domain in dim:
                return dim[domain]
            return infer_embedding_dim(cols[0], multiplier=infer_dim_multiplier)
        if isinstance(dim, int):
            return dim
        return infer_embedding_dim(cols[0], multiplier=infer_dim_multiplier)

    def _combiner_for(col: ColumnSchema) -> Optional[str]:
        if isinstance(sequence_combiner, dict):
            return sequence_combiner.get(col.name)
        if sequence_combiner == "default":
            if not col.is_list:
                return None
            return None if col.has_tag(Tags.SEQUENCE) else "mean"
        return sequence_combiner if col.is_list else None

    def _tt_eligible(domain, cols) -> bool:
        return (
            tt_compression_threshold is not None
            and (cols[0].cardinality or 0) > tt_compression_threshold
        )

    tables: Dict[str, EmbeddingTable] = {}
    if fused and isinstance(dim, int):
        # fuse single-column scalar domains with default options into shared
        # uniform-stride tables (TT-eligible domains are excluded —
        # compression takes precedence)
        fusable = [
            (domain, cols[0])
            for domain, cols in by_domain.items()
            if len(cols) == 1
            and not cols[0].is_list
            and not _tt_eligible(domain, cols)
            and (trainable is True or (isinstance(trainable, dict) and trainable.get(domain, True)))
            and domain not in (table_kwargs or {})
        ]
        groups = (
            _fused_groups([c for _, c in fusable], dim) if len(fusable) > 1 else []
        )
        domain_of = {c.name: d for d, c in fusable}
        consumed = set()
        for gi, chunk in enumerate(groups):
            name = "fused" if len(groups) == 1 else f"fused_{gi}"
            tables[name] = FusedEmbeddingTables(
                chunk, dim, l2_reg=l2_reg, seed=seed + 101 * gi
            )
            consumed.update(domain_of[c.name] for c in chunk)
        if consumed:
            by_domain = {d: cs for d, cs in by_domain.items() if d not in consumed}
    for i, (domain, cols) in enumerate(by_domain.items()):
        combiners = {_combiner_for(c) for c in cols}
        combiner = next(iter(combiners)) if len(combiners) == 1 else None
        tr = trainable if isinstance(trainable, bool) else trainable.get(domain, True)
        kw = (table_kwargs or {}).get(domain, {})
        if _tt_eligible(domain, cols):
            if not tr or kw:
                import warnings

                warnings.warn(
                    f"domain {domain!r} exceeds tt_compression_threshold but has "
                    f"{'trainable=False' if not tr else 'table_kwargs'} — using a "
                    "DENSE table (may not fit HBM at this cardinality)",
                    stacklevel=2,
                )
            else:
                from .tt_embedding import TTEmbeddingTable

                tables[domain] = TTEmbeddingTable(
                    dim=_dim_for(domain, cols),
                    col_schema=cols,
                    ranks=tt_ranks,
                    sequence_combiner=combiner,
                    l2_reg=l2_reg,
                    seed=seed + i,
                )
                continue
        if param_dtype is not None:
            kw = dict(kw)
            kw.setdefault("dtype", param_dtype)
        dyn = dynamic if isinstance(dynamic, bool) else dynamic.get(domain, False)
        if dyn:
            from .dynamic import DynamicEmbeddingTable

            tables[domain] = DynamicEmbeddingTable(
                dim=_dim_for(domain, cols),
                col_schema=cols,
                capacity=(dynamic_capacity or {}).get(domain),
                sequence_combiner=combiner,
                trainable=tr,
                l2_reg=l2_reg,
                seed=seed + i,
                **kw,
            )
            continue
        tables[domain] = EmbeddingTable(
            dim=_dim_for(domain, cols),
            col_schema=cols,
            sequence_combiner=combiner,
            trainable=tr,
            l2_reg=l2_reg,
            seed=seed + i,
            **kw,
        )

    return ParallelBlock(tables, block_name="embeddings", schema=cat)


class AverageEmbeddingsByWeightFeature(Block):
    """Weighted mean of sequence embeddings by a weight column
    (reference ``embedding.py:807``)."""

    def __init__(self, weight_feature_name: str):
        super().__init__()
        self.weight_feature_name = weight_feature_name

    def __call__(self, inputs: TensorDict, *, context=None, **kwargs):
        feats = context.features if context is not None else {}
        w = feats.get(self.weight_feature_name)
        if w is None:
            raise ValueError(f"weight feature {self.weight_feature_name} not in context")
        w_vals = w.values if isinstance(w, SequenceFeature) else w
        out = {}
        for name, v in inputs.items():
            if isinstance(v, SequenceFeature):
                weights = (w_vals * v.mask).astype(v.values.dtype)
                denom = jnp.maximum(weights.sum(axis=1, keepdims=True), 1e-9)
                out[name] = jnp.einsum("bld,bl->bd", v.values, weights) / denom
            else:
                out[name] = v
        return out


class PretrainedEmbeddingsBlock(Block):
    """Pass through pre-computed embedding columns (``Tags.EMBEDDING``),
    optionally pooled/normalized (reference ``embedding.py:717``)."""

    def __init__(
        self,
        schema: Schema,
        sequence_combiner: Optional[str] = "mean",
        normalizer: Optional[Callable] = None,
    ):
        emb_schema = schema.select_by_tag(Tags.EMBEDDING) if schema is not None else None
        super().__init__(schema=emb_schema, block_name="pretrained_embeddings")
        self.sequence_combiner = sequence_combiner
        self.normalizer = normalizer

    def __call__(self, inputs: TensorDict, **kwargs):
        out = {}
        for name, v in inputs.items():
            if isinstance(v, SequenceFeature) and self.sequence_combiner:
                v = SEQUENCE_COMBINERS[self.sequence_combiner](v)
            if self.normalizer is not None:
                v = self.normalizer(v)
            out[name] = v
        return out


def PretrainedEmbeddings(
    schema: Schema,
    sequence_combiner: Optional[str] = "mean",
    normalizer: Optional[Callable] = None,
) -> Block:
    """Factory kept for reference-name parity."""
    return PretrainedEmbeddingsBlock(schema, sequence_combiner, normalizer)


def EmbeddingFeatures(schema: Schema, dim: Union[int, Dict[str, int], None] = None,
                      seed: int = 0, **kwargs) -> ParallelBlock:
    """V1 multi-table lookup block (reference ``embedding.py:950``): one table
    per categorical domain, scalar features → (B, D)."""
    return Embeddings(schema, dim=dim, sequence_combiner=None, seed=seed, **kwargs)


def SequenceEmbeddingFeatures(schema: Schema, dim: Union[int, Dict[str, int], None] = None,
                              seed: int = 0, **kwargs) -> ParallelBlock:
    """V1 3-D sequence lookups (reference ``embedding.py:1309``): list features
    stay (B, L, D) SequenceFeatures (combiner=None)."""
    return Embeddings(schema, dim=dim, sequence_combiner=None, seed=seed, **kwargs)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _onehot_grad_lookup(table, local_ids, stride):
    """Fused-table gather whose BACKWARD is a batched one-hot matmul instead of
    XLA's scatter-add lowering: dtable = einsum('bfr,bfd->frd', onehot(ids), g).
    On this TPU the scatter path costs ~2.2ms for (8192, 26) ids into a
    26k x 64 table; the one-hot einsum (XLA fuses the one-hot into the MXU
    matmul, nothing materializes) costs ~0.12ms — 19x."""
    F = local_ids.shape[1]
    gids = local_ids + (jnp.arange(F, dtype=local_ids.dtype) * stride)[None, :]
    return jnp.take(table, gids, axis=0)


def _ogl_fwd(table, local_ids, stride):
    proto = jnp.zeros((), table.dtype)  # dtype token (residuals must be jax types)
    return _onehot_grad_lookup(table, local_ids, stride), (local_ids, table.shape, proto)


def _ogl_bwd(stride, res, g):
    local_ids, (rows, D), proto = res
    oh = jax.nn.one_hot(local_ids, stride, dtype=jnp.float32)
    d = jnp.einsum("bfr,bfd->frd", oh, g.astype(jnp.float32), preferred_element_type=jnp.float32)
    return d.reshape(rows, D).astype(proto.dtype), None


_onehot_grad_lookup.defvjp(_ogl_fwd, _ogl_bwd)

# uniform-stride fused tables are only worth the padding waste up to a point
_FUSED_STRIDE_MAX = 8192
_FUSED_BYTES_MAX = 256 << 20
# measured on v5e (B=8192, D=64): an extra gather + one-hot-backward kernel
# pair costs ~0.05 ms of fixed overhead; each (feature x stride-row) of
# one-hot backward costs ~1.05e-5 ms of MXU time. A stride tier merges into
# the next larger tier only when the extra MXU work is cheaper than the
# kernel pair it saves.
_FUSED_KERNEL_MS = 0.05
_FUSED_ROW_MS = 1.05e-5


def _fused_groups(cols, dim: int):
    """Partition fusable columns into uniform-stride groups: pow2 stride tiers
    with cost-based upward merging, each group capped at ``_FUSED_STRIDE_MAX``
    stride and ``_FUSED_BYTES_MAX`` total size.

    Never emits a group :class:`FusedEmbeddingTables` would tight-pack: the
    tight-pack layout takes the standard gather backward, and XLA's
    duplicate-id scatter-add over one big packed table is catastrophically
    slow on TPU (measured 207 ms/step for 26x8192 ids into a 523k x 64 table
    vs 3.6 ms for 26 separate tables). Columns whose padded cardinality
    exceeds the stride cap are left out and get their own tables.
    """
    tiers: Dict[int, list] = {}
    for c in cols:
        p = -(-int(c.cardinality) // 8) * 8
        if p > _FUSED_STRIDE_MAX:
            continue
        tiers.setdefault(1 << (p - 1).bit_length(), []).append(c)
    strides = sorted(tiers)
    groups = []
    for i, s in enumerate(strides):
        group = tiers[s]
        if i + 1 < len(strides):
            # a lone feature that stays behind costs a whole separate table
            # (gather + scatter + its own optimizer update), so it accepts a
            # pricier merge than a tier that would fuse on its own anyway
            thresh = _FUSED_KERNEL_MS if len(group) > 1 else 2 * _FUSED_KERNEL_MS
            if len(group) * (strides[i + 1] - s) * _FUSED_ROW_MS < thresh:
                tiers[strides[i + 1]] = group + tiers[strides[i + 1]]
                continue
        if len(group) < 2:
            continue
        max_feats = _FUSED_BYTES_MAX // (s * dim * 4)
        if max_feats < 2:
            # even a 2-column group would blow the bytes cap (huge stride*dim)
            # — emitting it anyway would trip FusedEmbeddingTables' uniform
            # check into the tight-pack layout the docstring forbids (ADVICE
            # r4). Leave these columns to per-domain tables instead.
            continue
        for j in range(0, len(group), max_feats):
            chunk = group[j : j + max_feats]
            if len(chunk) >= 2:
                groups.append(chunk)
    return groups


class FusedEmbeddingTables(EmbeddingTable):
    """One table serving many scalar categorical features: a single gather of
    (B, F) offset-shifted ids replaces F separate per-table gathers (the
    HugeCTR/SOK fused-table strategy). DLRM-style models with dozens of small
    categorical features are op-count-bound without this.

    When every feature fits a uniform row stride (small cardinalities), rows
    are laid out as (F * stride, D) and gradients flow through a one-hot-matmul
    custom VJP (see :func:`_onehot_grad_lookup`); otherwise rows pack tightly
    and gradients take the standard gather-backward.

    Inherits the EmbeddingTable machinery: mesh row-sharding (sharded_lookup),
    sparse-optimizer taps, regularization.
    """

    def __init__(
        self,
        col_schemas: Sequence[ColumnSchema],
        dim: int,
        trainable: bool = True,
        l2_reg: float = 0.0,
        dtype=jnp.float32,
        seed: int = 0,
    ):
        from ..schema import create_categorical_column

        cols = list(col_schemas)
        padded = [-(-int(c.cardinality) // 8) * 8 for c in cols]
        stride = max(padded)
        uniform = (
            stride <= _FUSED_STRIDE_MAX
            and stride * len(cols) * dim * 4 <= _FUSED_BYTES_MAX
        )
        if uniform:
            padded = [stride] * len(cols)
        else:
            import warnings

            warnings.warn(
                "FusedEmbeddingTables tight-packing (non-uniform strides): the "
                "backward is an XLA duplicate-id scatter-add over the packed "
                "table, which is extremely slow on TPU for large tables. "
                "Prefer Embeddings(..., fused=True), which only fuses "
                "uniform-stride groups.",
                stacklevel=2,
            )
        total = int(sum(padded))
        pseudo = create_categorical_column("fused_embeddings", total - 1)
        super().__init__(
            dim, pseudo, trainable=trainable, l2_reg=l2_reg, dtype=dtype, seed=seed
        )
        self.features = [c.name for c in cols]
        self.schema = Schema(cols)
        self.block_name = "fused_embeddings"
        self.stride = stride if uniform else None
        self.row_offsets = np.cumsum([0] + padded[:-1]).astype(np.int64).tolist()

    def _mesh_active(self, context) -> bool:
        mesh = context.get("mesh") if context is not None else None
        if mesh is None:
            return False
        from ..parallel.mesh import MODEL_AXIS

        n = dict(mesh.shape).get(MODEL_AXIS, 1)
        return n > 1 and self.padded_rows % n == 0

    def __call__(self, inputs, *, context=None, **kwargs):
        local = jnp.stack(
            [jnp.asarray(inputs[name]).astype(jnp.int32) for name in self.features],
            axis=1,
        )  # (B, F)
        if self.stride is not None and not self._mesh_active(context):
            emb = _onehot_grad_lookup(self.table.value, local, self.stride)
            offsets = jnp.arange(len(self.features), dtype=jnp.int32) * self.stride
            ids = local + offsets[None, :]
        else:
            ids = local + jnp.asarray(self.row_offsets, jnp.int32)[None, :]
            emb = self._lookup(ids, context=context)  # (B, F, D)
        emb = self._tap(emb, ids, "fused", context)
        return {name: emb[:, i] for i, name in enumerate(self.features)}

    def __repr__(self):
        return f"FusedEmbeddingTables({self.input_dim}x{self.dim}, features={self.features})"
