"""Negative candidate samplers (reference ``merlin/models/tf/outputs/sampling/``).

``Candidate`` carries ids + embeddings + analytic sampling probabilities (for logQ
correction). Samplers are pure w.r.t. the traced step: the popularity sampler uses
a counter-derived fold of the step RNG, so sampling differs per step but stays
reproducible and jit-compatible.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from ..core.block import Block
from ..registry import sampler_registry


class Candidate(NamedTuple):
    """(reference ``outputs/sampling/base.py:26``)

    ``valid`` marks real rows: with drop_last=False the loader pads the tail
    batch, and padded rows must not act as in-batch negatives (they decode to
    item id 0). Samplers that derive negatives from the batch propagate it;
    catalog samplers leave it None (all valid)."""

    id: jnp.ndarray  # (N,)
    embedding: Optional[jnp.ndarray] = None  # (N, D)
    sampling_prob: Optional[jnp.ndarray] = None  # (N,)
    metadata: Optional[dict] = None
    valid: Optional[jnp.ndarray] = None  # (N,) bool


class CandidateSampler(Block):
    """ABC: ``__call__(positive: Candidate, ...) -> Candidate`` of negatives."""

    def __call__(self, positive: Candidate, *, training: bool = False, step=None, **kwargs):
        raise NotImplementedError

    @staticmethod
    def parse(s) -> "CandidateSampler":
        if isinstance(s, CandidateSampler):
            return s
        return sampler_registry.parse(s)


@sampler_registry.register_with_multiple_names("in-batch", "inbatch")
class InBatchSampler(CandidateSampler):
    """The batch's positive items are everyone's negatives
    (reference ``outputs/sampling/in_batch.py:25``). Zero extra memory, and the
    candidate matrix is already on-chip — the contrastive matmul is (B,D)x(D,B),
    exactly MXU-shaped."""

    def __call__(self, positive: Candidate, *, training: bool = False, step=None, **kwargs):
        return positive


@sampler_registry.register_with_multiple_names("popularity", "popularity-based")
class PopularityBasedSampler(CandidateSampler):
    """Zipfian (log-uniform) sampling over the catalog with analytic sampling
    probabilities for logQ correction (reference ``outputs/sampling/popularity.py:24``,
    probability form of ``tf.random.log_uniform_candidate_sampler``):

        P(id) = (log(id+2) - log(id+1)) / log(max_id + 2)

    (the +2 divisor matches ``_zipf_sample``'s inverse CDF over [0, max_id] —
    the distribution must integrate to 1 over the ids the sampler can emit)

    Requires item ids to be frequency-sorted (id 0 = most popular), the same
    contract as the reference. Embeddings for the sampled ids are looked up from
    the tied item table by the contrastive head.
    """

    def __init__(self, max_num_samples: int = 100, max_id: Optional[int] = None, seed: int = 0):
        super().__init__()
        self.max_num_samples = int(max_num_samples)
        self.max_id = max_id
        self.seed = seed

    def _zipf_sample(self, key, n, max_id):
        # inverse-CDF of the log-uniform distribution over [0, max_id]
        u = jax.random.uniform(key, (n,))
        ids = jnp.exp(u * jnp.log(float(max_id) + 2.0)) - 1.0
        return jnp.clip(ids.astype(jnp.int32), 0, max_id)

    def sampling_probs(self, ids: jnp.ndarray, max_id: int) -> jnp.ndarray:
        ids_f = ids.astype(jnp.float32)
        return (jnp.log(ids_f + 2.0) - jnp.log(ids_f + 1.0)) / jnp.log(float(max_id) + 2.0)

    def __call__(self, positive: Candidate, *, training: bool = False, step=None, **kwargs):
        max_id = self.max_id
        if max_id is None:
            raise ValueError("PopularityBasedSampler needs max_id (catalog size - 1)")
        fold = step if step is not None else 0
        key = jax.random.fold_in(jax.random.key(self.seed), fold)
        ids = self._zipf_sample(key, self.max_num_samples, max_id)
        return Candidate(id=ids, embedding=None, sampling_prob=self.sampling_probs(ids, max_id))
