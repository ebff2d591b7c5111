"""Cross-batch negative caching: FIFO queue sampler.

Reference: ``merlin/models/tf/blocks/sampling/queue.py:22`` (FIFOQueue ring
buffer) + ``sampling/cross_batch.py`` (CachedCrossBatchSampler). TPU-native:
the ring buffer is functional NNX state (two Variables: buffer + write cursor)
updated inside the compiled train step — no host round trips.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.block import Block
from ..registry import sampler_registry
from .sampling import Candidate, CandidateSampler


class FIFOQueue(Block):
    """Fixed-capacity device-resident ring buffer of (id, embedding) pairs."""

    def __init__(self, capacity: int, dim: int):
        super().__init__()
        self.capacity = int(capacity)
        self.dim = int(dim)
        self.embeddings = nnx.Variable(jnp.zeros((capacity, dim), jnp.float32))
        self.ids = nnx.Variable(jnp.full((capacity,), -1, jnp.int32))
        self.cursor = nnx.Variable(jnp.zeros((), jnp.int32))

    def enqueue_functional(self, ids: jnp.ndarray, embeddings: jnp.ndarray):
        """New (embeddings, ids, cursor) arrays after enqueue — no mutation
        (NNX forbids Variable writes inside the grad trace; the train body
        applies these into the step's output state instead).

        Implementation notes: NO row scatter. ``.at[pos].set`` with computed
        indices is the pattern CLAUDE.md records as catastrophically slow on
        this TPU (serialized row updates), and with ``n > capacity`` the
        wrapped indices collide — duplicate-index write order is unspecified,
        so the queue could keep the OLDEST rows. A ring write is two
        contiguous pieces: write the block into a doubled buffer at ``start``
        (one dynamic_update_slice), then fold the halves."""
        n = ids.shape[0]
        cap = self.capacity
        emb = jax.lax.stop_gradient(embeddings).astype(self.embeddings.value.dtype)
        ids = ids.astype(jnp.int32)
        start = self.cursor.value
        new_cursor = (start + n) % cap
        if n >= cap:
            # full wrap: only the LAST `cap` rows survive (FIFO). Slot
            # (new_cursor + i) % cap holds kept[i] — i.e. roll by the final
            # cursor so the oldest kept row sits at new_cursor.
            kept_emb = emb[n - cap:]
            kept_ids = ids[n - cap:]
            new_emb = jnp.roll(kept_emb, new_cursor, axis=0)
            new_ids = jnp.roll(kept_ids, new_cursor, axis=0)
            return new_emb, new_ids, new_cursor

        def ring_write(buf, block):
            doubled = jnp.concatenate([buf, buf], axis=0)
            doubled = jax.lax.dynamic_update_slice(
                doubled, block, (start,) + (0,) * (buf.ndim - 1)
            )
            lo, hi = doubled[:cap], doubled[cap:]
            # second-copy slot cap+j was written iff start + n > cap + j
            wrapped = (jnp.arange(cap) < start + n - cap)
            mask = wrapped.reshape((cap,) + (1,) * (buf.ndim - 1))
            return jnp.where(mask, hi, lo)

        return ring_write(self.embeddings.value, emb), ring_write(self.ids.value, ids), new_cursor

    def enqueue(self, ids: jnp.ndarray, embeddings: jnp.ndarray) -> None:
        """Eager/host-side enqueue (outside any jit/grad trace)."""
        new_emb, new_ids, new_cursor = self.enqueue_functional(ids, embeddings)
        self.embeddings.value = new_emb
        self.ids.value = new_ids
        self.cursor.value = new_cursor

    def snapshot(self) -> Candidate:
        # unfilled slots (id -1) carry valid=False: the contrastive head
        # downscores them to MIN_FLOAT instead of scoring zero vectors
        return Candidate(
            id=self.ids.value,
            embedding=self.embeddings.value,
            valid=self.ids.value >= 0,
        )


@sampler_registry.register_with_multiple_names("cross-batch", "cached-cross-batch")
class CachedCrossBatchSampler(CandidateSampler):
    """Negatives = the last ``capacity`` positives seen across PREVIOUS
    batches (reference ``CachedCrossBatchSampler``): the snapshot is taken
    BEFORE enqueueing the current batch, deliberately — the standard
    composition ``[InBatchSampler(), CachedCrossBatchSampler()]`` would
    otherwise score every current positive twice. Unfilled slots carry id -1
    and ``valid=False`` — the contrastive head downscores them to MIN_FLOAT
    so warm-up batches never score against zero vectors."""

    def __init__(self, capacity: int = 4096, dim: int = 64):
        super().__init__()
        self.queue = FIFOQueue(capacity, dim)
        # unique per live object — a resettable class counter could collide
        # with an instance unpickled by load_model before build()-time
        # _rekey_stateful_blocks assigns canonical traversal-position keys
        import uuid

        self._state_key = f"fifo_queue_{uuid.uuid4().hex[:12]}"

    def state_update_targets(self):
        """field name -> Variable, for the engine's functional state updates."""
        return {
            "embeddings": self.queue.embeddings,
            "ids": self.queue.ids,
            "cursor": self.queue.cursor,
        }

    def __call__(self, positive: Candidate, *, training: bool = False, step=None,
                 context=None, **kwargs):
        snapshot = self.queue.snapshot()
        if training and positive.embedding is not None and positive.id is not None:
            new_emb, new_ids, new_cursor = self.queue.enqueue_functional(
                positive.id, positive.embedding
            )
            if context is not None:
                # functional: the jitted train body writes these into the
                # step's output state (Variable mutation is illegal under the
                # grad trace)
                context.setdefault("state_updates", {})[self._state_key] = {
                    "embeddings": new_emb, "ids": new_ids, "cursor": new_cursor,
                }
            else:  # eager call outside any trace
                self.queue.embeddings.value = new_emb
                self.queue.ids.value = new_ids
                self.queue.cursor.value = new_cursor
        return snapshot
