"""Optimizers: row-sparse embedding updates + per-block optimizer routing.

Reference: ``merlin/models/tf/blocks/optimizer.py`` — ``MultiOptimizer`` (:169),
``LazyAdam`` (:342, sparse IndexedSlices-aware Adam that updates only touched
rows), ``split_embeddings_on_size`` (:461).

TPU-native redesign:

- **Row-sparse embedding updates.** JAX gradients are dense, so instead of
  differentiating the table we differentiate a zero "tap" added to each gathered
  row (``EmbeddingTable._tap``): grad-of-tap = grad of the gathered rows, and the
  optimizer applies a scatter update touching only ~batch rows. For a 162k×128
  table at batch 8k this is ~4MB of HBM traffic instead of ~340MB (table + slots
  rewritten) per step — the difference measured directly in bench.py.
- ``MultiOptimizer`` = ``optax.multi_transform`` with path-regex param labels
  (state paths contain block/branch names, so "route the user tower to SGD" is a
  regex on ``user``).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import optax
from flax import nnx


# ---------------------------------------------------------------------------
# row-sparse embedding optimizers
# ---------------------------------------------------------------------------

def _table_salt(table) -> int:
    """Stable per-table integer for stochastic-rounding keys (process-hash-free
    so runs are reproducible across processes)."""
    import zlib

    name = getattr(table, "block_name", None) or "table"
    return zlib.crc32(str(name).encode()) & 0x7FFFFFFF


def _commit_rows(tbl, sids, delta, valid, step, salt):
    """Apply per-row optimizer deltas to a table.

    float32 tables: in-place Pallas scatter-ADD of the delta (unchanged hot
    path). Low-precision (bfloat16) tables: the new row is computed in float32
    and written back with STOCHASTIC ROUNDING — round-to-nearest would drop
    any update smaller than half a ulp of the running value and stall
    learning; unbiased rounding applies it with proportional probability. The
    rounding key is (step, table) so replays are deterministic."""
    from ..ops.scatter import (
        pallas_row_scatter_add,
        pallas_row_scatter_write,
        stochastic_round,
    )

    if tbl.dtype == jnp.float32:
        return pallas_row_scatter_add(tbl, sids, delta, valid)
    old = jnp.take(tbl, sids, axis=0).astype(jnp.float32)
    key = jax.random.fold_in(jax.random.key(salt), jnp.asarray(step, jnp.uint32))
    rows = stochastic_round(old + delta, key, tbl.dtype)
    return pallas_row_scatter_write(tbl, sids, rows, valid)

class SparseEmbeddingOptimizer:
    """Scatter-updates embedding tables from (ids, row-grads) pairs.

    ``kind``: 'sgd' | 'adagrad' (lazy) | 'adam' (LazyAdam semantics: slots update
    only at touched rows; bias correction uses the global step).
    """

    def __init__(self, kind: str = "adagrad",
                 learning_rate: Union[float, Callable] = 0.05,
                 beta1: float = 0.9, beta2: float = 0.999, eps: float = 1e-8,
                 initial_accumulator_value: float = 0.1):
        if kind not in ("sgd", "adagrad", "adam"):
            raise ValueError(f"Unknown sparse optimizer {kind!r}")
        self.kind = kind
        self.learning_rate = learning_rate
        self.beta1, self.beta2, self.eps = beta1, beta2, eps
        self.init_acc = initial_accumulator_value

    # ---- slots -------------------------------------------------------------
    def init_slots(self, table) -> None:
        """Create slot Variables on the EmbeddingTable module."""
        shape = table.table.value.shape
        if self.kind == "adagrad":
            table.sparse_slots = nnx.Dict(
                {"acc": nnx.Variable(jnp.full(shape, self.init_acc, jnp.float32))}
            )
        elif self.kind == "adam":
            table.sparse_slots = nnx.Dict(
                {
                    "m": nnx.Variable(jnp.zeros(shape, jnp.float32)),
                    "v": nnx.Variable(jnp.zeros(shape, jnp.float32)),
                }
            )
        else:
            table.sparse_slots = nnx.Dict({})

    # ---- update ------------------------------------------------------------
    def apply(self, table, ids: jnp.ndarray, grads: jnp.ndarray, step: jnp.ndarray,
              mesh=None, axis: str = "model"):
        """Scatter-update the table (and slots) at the looked-up rows.

        ``ids``: (N,) int32 flattened; ``grads``: (N, D) row gradients. Duplicate
        ids are segment-summed first, so each unique row receives exactly one
        optimizer update from the accumulated gradient — identical to the dense
        path's semantics.

        All writes go through :func:`ops.scatter.pallas_row_scatter_add` (HBM
        traffic ~ touched rows, not table size): XLA's own ``.at[ids].add``
        lowering on this TPU serializes row updates (CLAUDE.md) which made the
        sparse path a pessimization in round 1.

        With ``mesh`` and a table whose rows divide the model axis (the same
        routing condition as the sharded lookup), the whole update — slot math
        included — runs inside ONE ``shard_map``: each device read-modify-writes
        only the rows it owns on its local table/slot shards. Nothing
        table-sized ever crosses ICI (SOK trains sharded tables sparsely; this
        is the matching write path, reference ``tf/distributed/embedding.py``).
        """
        from ..ops.scatter import dedup_rows, pallas_row_scatter_add

        flat_ids = ids.reshape(-1)
        flat_g = grads.reshape(-1, grads.shape[-1]).astype(jnp.float32)
        sids, gsum, valid = dedup_rows(flat_ids, flat_g)
        n_shards = dict(mesh.shape).get(axis, 1) if mesh is not None else 1
        if n_shards > 1 and table.padded_rows % n_shards == 0:
            return self._apply_sharded(table, sids, gsum, valid, step, mesh, axis)
        # learning_rate may be an optax-style schedule: step -> lr (Keras
        # LearningRateSchedule parity; evaluated inside the traced step)
        lr = self.learning_rate(step) if callable(self.learning_rate) else self.learning_rate
        salt = _table_salt(table)

        if self.kind == "sgd":
            table.table.value = _commit_rows(
                table.table.value, sids, -lr * gsum, valid, step, salt
            )
            return

        if self.kind == "adagrad":
            acc = table.sparse_slots["acc"].value
            acc_new_rows = jnp.take(acc, sids, axis=0) + gsum * gsum
            table.sparse_slots["acc"].value = pallas_row_scatter_add(
                acc, sids, gsum * gsum, valid
            )
            denom = jnp.sqrt(acc_new_rows) + self.eps
            table.table.value = _commit_rows(
                table.table.value, sids, -lr * gsum / denom, valid, step, salt
            )
            return

        # adam (LazyAdam): m/v decay + update only at touched rows
        m = table.sparse_slots["m"].value
        v = table.sparse_slots["v"].value
        b1, b2 = self.beta1, self.beta2
        m_old = jnp.take(m, sids, axis=0)
        v_old = jnp.take(v, sids, axis=0)
        m_new = b1 * m_old + (1 - b1) * gsum
        v_new = b2 * v_old + (1 - b2) * gsum * gsum
        table.sparse_slots["m"].value = pallas_row_scatter_add(m, sids, m_new - m_old, valid)
        table.sparse_slots["v"].value = pallas_row_scatter_add(v, sids, v_new - v_old, valid)
        t = jnp.maximum(step.astype(jnp.float32) + 1.0, 1.0)
        mhat = m_new / (1 - b1**t)
        vhat = v_new / (1 - b2**t)
        table.table.value = _commit_rows(
            table.table.value, sids,
            -lr * mhat / (jnp.sqrt(vhat) + self.eps), valid, step, salt,
        )

    def _apply_sharded(self, table, sids, gsum, valid, step, mesh, axis):
        """One shard_map over the model axis doing the full sparse update on
        local shards (ids/row-grads replicated — one (B, D)-sized broadcast is
        the only collective; table and slots never move)."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from ..ops.scatter import pallas_row_scatter_add

        n = dict(mesh.shape)[axis]
        rows_per = table.padded_rows // n
        lr_spec, eps, kind = self.learning_rate, self.eps, self.kind
        salt = _table_salt(table)
        slot_names = sorted(table.sparse_slots) if table.sparse_slots is not None else []
        slots = {k: table.sparse_slots[k].value for k in slot_names}
        b1, b2 = self.beta1, self.beta2

        def local(tbl, slots, sids, gsum, valid, step):
            lr = lr_spec(step) if callable(lr_spec) else lr_spec
            shard = jax.lax.axis_index(axis)
            local_ids = sids - shard * rows_per
            owned = valid & (local_ids >= 0) & (local_ids < rows_per)
            safe = jnp.clip(local_ids, 0, rows_per - 1).astype(jnp.int32)
            if kind == "sgd":
                return _commit_rows(tbl, safe, -lr * gsum, owned, step, salt), slots
            if kind == "adagrad":
                acc = slots["acc"]
                acc_rows = jnp.take(acc, safe, axis=0) + gsum * gsum
                new_acc = pallas_row_scatter_add(acc, safe, gsum * gsum, owned)
                denom = jnp.sqrt(acc_rows) + eps
                new_tbl = _commit_rows(tbl, safe, -lr * gsum / denom, owned, step, salt)
                return new_tbl, {"acc": new_acc}
            m, v = slots["m"], slots["v"]
            m_old = jnp.take(m, safe, axis=0)
            v_old = jnp.take(v, safe, axis=0)
            m_new = b1 * m_old + (1 - b1) * gsum
            v_new = b2 * v_old + (1 - b2) * gsum * gsum
            new_m = pallas_row_scatter_add(m, safe, m_new - m_old, owned)
            new_v = pallas_row_scatter_add(v, safe, v_new - v_old, owned)
            t = jnp.maximum(step.astype(jnp.float32) + 1.0, 1.0)
            mhat = m_new / (1 - b1**t)
            vhat = v_new / (1 - b2**t)
            new_tbl = _commit_rows(
                tbl, safe, -lr * mhat / (jnp.sqrt(vhat) + eps), owned, step, salt
            )
            return new_tbl, {"m": new_m, "v": new_v}

        sharded = P(axis, None)
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(sharded, {k: sharded for k in slots}, P(), P(), P(), P()),
            out_specs=(sharded, {k: sharded for k in slots}),
        )
        new_tbl, new_slots = fn(
            table.table.value, slots, sids, gsum, valid, jnp.asarray(step)
        )
        table.table.value = new_tbl
        for k in slot_names:
            table.sparse_slots[k].value = new_slots[k]


def LazyAdam(learning_rate: float = 0.001, beta1: float = 0.9, beta2: float = 0.999,
             eps: float = 1e-8) -> SparseEmbeddingOptimizer:
    """Sparse Adam that updates only looked-up rows (reference ``LazyAdam:342``)."""
    return SparseEmbeddingOptimizer("adam", learning_rate, beta1, beta2, eps)


def low_precision_optimizer_state(
    tx: optax.GradientTransformation, dtype=jnp.bfloat16
) -> optax.GradientTransformation:
    """Store the wrapped transform's float32 state leaves in ``dtype`` at rest.

    The dense embedding-optimizer step is HBM-bound (optimizer state is read
    and rewritten every step — see the bench's adagrad decomposition): halving
    the at-rest width of the slots cuts that traffic ~2x for the state share.
    The update math stays float32 — leaves are cast up entering the inner
    ``update`` and back down on the way out; XLA fuses both casts into the
    update kernel so the round trip costs no extra HBM pass.

    Opt in via ``compile(optimizer_state_dtype="bfloat16")``. Caveat: bf16
    carries ~8 bits of mantissa, so monotone accumulators (adagrad
    sum-of-squares, adam second moment) absorb relative increments below
    ~2^-8 as zero — fine for the short/medium regimes recommender training
    runs in (trajectory-tolerance tested), but not a default.
    """
    dtype = jnp.dtype(dtype)

    def _cast(tree, src, dst):
        return jax.tree.map(
            lambda x: x.astype(dst)
            if hasattr(x, "dtype") and x.dtype == src
            else x,
            tree,
        )

    def init_fn(params):
        return _cast(tx.init(params), jnp.float32, dtype)

    def update_fn(updates, state, params=None):
        updates, new_state = tx.update(updates, _cast(state, dtype, jnp.float32), params)
        return updates, _cast(new_state, jnp.float32, dtype)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# per-block routing for dense params
# ---------------------------------------------------------------------------

def _path_to_str(path) -> str:
    parts = []
    for k in path:
        for attr in ("key", "idx", "name"):
            if hasattr(k, attr):
                parts.append(str(getattr(k, attr)))
                break
        else:
            parts.append(str(k))
    return "/".join(parts)


class MultiOptimizer:
    """Route parameter subtrees to different optax transforms by path regex
    (reference ``MultiOptimizer:169`` routes by block; NNX state paths contain
    the block/branch names so a regex expresses the same selection).

    >>> opt = MultiOptimizer(default=optax.adam(1e-3),
    ...                      rules=[("embeddings", optax.adagrad(0.05))])
    """

    def __init__(
        self,
        default: optax.GradientTransformation,
        rules: Sequence[Tuple[object, optax.GradientTransformation]] = (),
    ):
        self.default = default
        self.rules = list(rules)

    def build(self, params) -> optax.GradientTransformation:
        """Selectors: a path regex (str) or a Block instance (matches that block's
        params by identity, like the reference's block→optimizer dict)."""
        matchers = []
        for i, (sel, _) in enumerate(self.rules):
            if isinstance(sel, str):
                pat = re.compile(sel)
                matchers.append(("regex", pat, i))
            else:
                ids = {
                    id(leaf.value) if hasattr(leaf, "value") else id(leaf)
                    for leaf in jax.tree_util.tree_leaves(
                        nnx.state(sel, nnx.Param), is_leaf=lambda x: hasattr(x, "value")
                    )
                }
                matchers.append(("ids", ids, i))

        def label(path, leaf):
            p = _path_to_str(path)
            lid = id(leaf.value) if hasattr(leaf, "value") else id(leaf)
            for kind, m, i in matchers:
                if kind == "regex" and m.search(p):
                    return f"rule_{i}"
                if kind == "ids" and lid in m:
                    return f"rule_{i}"
            return "default"

        labels = jax.tree_util.tree_map_with_path(
            label, params, is_leaf=lambda x: hasattr(x, "value")
        )
        transforms = {"default": self.default}
        for i, (_, tx) in enumerate(self.rules):
            transforms[f"rule_{i}"] = tx
        # disjointness is inherent: first-matching-rule wins per leaf
        return optax.multi_transform(transforms, labels)


def split_embeddings_on_size(tables: Sequence, threshold: int) -> Tuple[List, List]:
    """Partition EmbeddingTables into (large, small) by cardinality
    (reference ``split_embeddings_on_size:461``) — large tables typically get the
    sparse optimizer, small ones ride the dense path."""
    large = [t for t in tables if t.input_dim > threshold]
    small = [t for t in tables if t.input_dim <= threshold]
    return large, small
