"""Dynamic-vocabulary embedding table: device-resident open-addressing
id→slot hash map in front of a fixed-capacity table.

The reference wraps ``sok.DynamicVariable`` (a GPU hash-table embedding that
grows as unseen ids arrive) for unbounded/streaming id spaces
(``merlin/models/tf/distributed/embedding.py:16-233``) and accepts raw string
ids via ``tf.nn.safe_embedding_lookup_sparse``
(``tf/inputs/embedding.py:439``). TPU-native constraints rule out a truly
growable table (XLA needs static shapes), so this is the standard production
alternative: a FIXED-CAPACITY slot table plus a vectorized open-addressing
id→slot map that ALLOCATES slots for unseen ids during training, entirely
on-device and inside the compiled train step.

Design (all static shapes, no data-dependent control flow):

- ``hash_keys`` — (capacity,) int32, EMPTY=-1; the probe position IS the
  embedding row (bucket i owns table row i).
- lookup: ``P`` linear probes from ``mix(id) % capacity`` (one (B, P) gather);
  first key match wins.
- insert (training only): unmatched ids claim the first EMPTY slot in their
  probe window via a single ``.at[pos].max(id)`` scatter — intra-batch races
  between DIFFERENT ids for the same slot resolve by max; losers (and ids
  whose whole probe window is full — the overflow case) fall back to the
  SHARED ``mix(id) % capacity`` slot. Duplicate ids in one batch claim the
  same slot and both re-read it as a match. One scatter round, no retries:
  races are rare below ~80% load factor and the fallback is graceful
  (collision = two ids sharing one embedding row, exactly the semantics of
  the reference's hashed-id workaround).
- no eviction: once allocated, a slot is owned for the model's lifetime.
  Size the capacity ≥ expected distinct ids / 0.8.

The updated ``hash_keys`` rides the engine's functional state-update protocol
(same as FIFOQueue / BatchNorm): inserts survive across fused scan steps and
fit() calls. Composes with the sparse row optimizer (taps record SLOTS, so
scatter updates hit the right rows) and with mesh row-sharding (slots are
ordinary row indices into the padded table).
"""

from __future__ import annotations

import uuid
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..core.types import SequenceFeature
from ..schema import ColumnSchema
from .embedding import EmbeddingTable

EMPTY = -1
_PROBES = 8


def _mix(ids: jnp.ndarray) -> jnp.ndarray:
    """32-bit avalanche hash (xxhash/murmur-style finalizer): raw ids may be
    dense, strided, or 31-bit string hashes — the probe start must decorrelate
    from all of them."""
    x = ids.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def string_id_hash(values: np.ndarray) -> np.ndarray:
    """Hash raw string/bytes ids → non-negative int32, deterministically
    across runs and hosts (unlike Python's salted ``hash``).

    The loader applies this to string-typed columns (``table_to_numpy``) so
    raw-string id spaces (the reference's ``safe_embedding_lookup_sparse``
    use case) feed :class:`DynamicEmbeddingTable` without a host-side
    vocabulary pass. Vectorized via pandas' siphash (fixed key) when
    available; FNV-1a loop otherwise — ONE convention per process, chosen at
    import time, so loader-hashed and user-hashed ids always agree."""
    arr = np.asarray(values, dtype=object)
    if _PD_HASH is not None:
        h = _PD_HASH(arr, categorize=False)
    else:  # pragma: no cover - pandas is baked into this environment
        h = np.empty(len(arr), np.uint64)
        for i, v in enumerate(arr):
            acc = 0xCBF29CE484222325
            data = v.encode() if isinstance(v, str) else bytes(v)
            for b in data:
                acc = (acc ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF
            h[i] = acc
    return (h % np.uint64(2**31 - 1)).astype(np.int32)


try:  # resolved once: the convention must not change mid-process
    from pandas.util import hash_array as _PD_HASH
except Exception:  # pragma: no cover
    _PD_HASH = None


class DynamicEmbeddingTable(EmbeddingTable):
    """``EmbeddingTable`` whose row index is allocated on first sight of an id.

    ``capacity``: number of embedding rows (the hash map's bucket count).
    Raw ids may span any non-negative int32 range — they are never used as
    row indices directly.
    """

    def __init__(
        self,
        dim: int,
        col_schema: Union[ColumnSchema, Sequence[ColumnSchema]],
        capacity: Optional[int] = None,
        probes: int = _PROBES,
        **kwargs,
    ):
        cols = [col_schema] if isinstance(col_schema, ColumnSchema) else list(col_schema)
        if capacity is None:
            card = cols[0].cardinality
            if card is None:
                raise ValueError(
                    "DynamicEmbeddingTable needs `capacity` when the column "
                    "has no cardinality"
                )
            # headroom for the open-addressing load factor
            capacity = int(card / 0.8) + probes
        # build the underlying fixed table at `capacity` rows: EmbeddingTable
        # validates cardinality against the column, so clone the columns with
        # the capacity as their domain size
        from dataclasses import replace

        from ..schema import Domain

        sized = [
            replace(
                c,
                int_domain=Domain(
                    min=0,
                    max=int(capacity) - 1,
                    name=(c.int_domain.name if c.int_domain else c.name),
                ),
            )
            for c in cols
        ]
        super().__init__(dim, sized, **kwargs)
        self.capacity = int(self.padded_rows)  # probe space = padded rows
        self.probes = int(probes)
        self.dynamic = True
        self.hash_keys = nnx.Variable(jnp.full((self.capacity,), EMPTY, jnp.int32))
        self._state_key = f"dyn_embedding_{uuid.uuid4().hex[:12]}"

    # -- functional state protocol (models/base._apply_state_updates) -------
    def state_update_targets(self):
        return {"hash_keys": self.hash_keys}

    @property
    def num_allocated(self) -> int:
        """Distinct ids that own a slot (host-side convenience)."""
        return int(jnp.sum(self.hash_keys.value != EMPTY))

    # ------------------------------------------------------------------
    def _map_ids(self, raw: jnp.ndarray, keys: jnp.ndarray, training: bool):
        """(raw (B,) int32, keys (cap,)) → (slots (B,), new_keys (cap,))."""
        cap = self.capacity
        raw = raw.astype(jnp.int32)
        h = (_mix(raw) % jnp.uint32(cap)).astype(jnp.int32)
        pos = (h[:, None] + jnp.arange(self.probes, dtype=jnp.int32)[None, :]) % cap
        window = jnp.take(keys, pos.reshape(-1)).reshape(pos.shape)  # (B, P)
        is_match = window == raw[:, None]
        matched = is_match.any(axis=1)
        first = lambda m: jnp.argmax(m, axis=1)
        match_slot = jnp.take_along_axis(pos, first(is_match)[:, None], axis=1)[:, 0]
        fallback = h  # shared mod-hash slot: overflow / race losers

        if not training:
            return jnp.where(matched, match_slot, fallback), keys

        empty = window == EMPTY
        has_empty = empty.any(axis=1)
        cand = jnp.take_along_axis(pos, first(empty)[:, None], axis=1)[:, 0]
        need = (~matched) & has_empty
        # claim: max-scatter into empty slots only (EMPTY=-1 < any id, so max
        # both claims empties and resolves two-id races deterministically);
        # non-inserting lanes scatter EMPTY, a no-op under max
        claim_val = jnp.where(need, raw, EMPTY)
        new_keys = keys.at[cand].max(claim_val)
        won = jnp.take(new_keys, cand) == raw
        slot = jnp.where(
            matched, match_slot, jnp.where(need & won, cand, fallback)
        )
        return slot, new_keys

    def _current_keys(self, context):
        """Thread intra-step inserts: a second feature/call in the same step
        must see the first call's allocations."""
        if context is not None:
            upd = context.get("state_updates")
            if upd and self._state_key in upd:
                return upd[self._state_key]["hash_keys"]
        return self.hash_keys.value

    def _emit_keys(self, new_keys, context, training):
        if not training:
            return
        if context is not None:
            context.setdefault("state_updates", {})[self._state_key] = {
                "hash_keys": new_keys
            }
        else:  # eager, outside any trace
            self.hash_keys.value = new_keys

    def _call_single(self, value, feature=None, context=None, training=False):
        keys = self._current_keys(context)
        if isinstance(value, SequenceFeature):
            flat = value.values.reshape(-1)
            slots, new_keys = self._map_ids(flat, keys, training)
            self._emit_keys(new_keys, context, training)
            mapped = SequenceFeature(
                slots.reshape(value.values.shape), value.mask
            )
            return super()._call_single(mapped, feature=feature, context=context)
        slots, new_keys = self._map_ids(value.reshape(-1), keys, training)
        self._emit_keys(new_keys, context, training)
        return super()._call_single(
            slots.reshape(value.shape), feature=feature, context=context
        )

    def __call__(self, inputs, *, context=None, training=False, **kwargs):
        if isinstance(inputs, dict):
            return {
                name: self._call_single(
                    inputs[name], feature=name, context=context, training=training
                )
                for name in self.features
                if name in inputs
            }
        return self._call_single(
            inputs, feature=self.features[0], context=context, training=training
        )

    def __repr__(self):
        return (
            f"DynamicEmbeddingTable(capacity={self.capacity}x{self.dim}, "
            f"features={self.features})"
        )
