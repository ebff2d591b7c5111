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

    def enqueue(self, ids: jnp.ndarray, embeddings: jnp.ndarray) -> None:
        n = ids.shape[0]
        start = self.cursor.value
        pos = (start + jnp.arange(n)) % self.capacity
        self.embeddings.value = self.embeddings.value.at[pos].set(
            jax.lax.stop_gradient(embeddings)
        )
        self.ids.value = self.ids.value.at[pos].set(ids.astype(jnp.int32))
        self.cursor.value = (start + n) % self.capacity

    def snapshot(self) -> Candidate:
        return Candidate(id=self.ids.value, embedding=self.embeddings.value)


@sampler_registry.register_with_multiple_names("cross-batch", "cached-cross-batch")
class CachedCrossBatchSampler(CandidateSampler):
    """Negatives = the last ``capacity`` positives seen across batches
    (reference ``CachedCrossBatchSampler``): enqueue current positives, return
    the queue snapshot. Unfilled slots carry id -1, which the contrastive head's
    false-negative mask never matches, but their zero embeddings would score
    0 — so we downscore them via a sentinel id check in the head (id -1 rows
    produce scores against zero vectors = 0; acceptable early-training noise,
    identical to the reference's warm-up behavior)."""

    def __init__(self, capacity: int = 4096, dim: int = 64):
        super().__init__()
        self.queue = FIFOQueue(capacity, dim)

    def __call__(self, positive: Candidate, *, training: bool = False, step=None, **kwargs):
        snapshot = self.queue.snapshot()
        if training and positive.embedding is not None and positive.id is not None:
            self.queue.enqueue(positive.id, positive.embedding)
        return snapshot
