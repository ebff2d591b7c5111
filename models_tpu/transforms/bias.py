"""Logit corrections (reference ``merlin/models/tf/transforms/bias.py``)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.block import Block
from ..core.types import Prediction

from ..outputs.base import LogitsTemperatureScaler  # re-export (reference lives here)


class PopularityLogitsCorrection(Block):
    """Subtract log(sampling probability) derived from item frequencies
    (reference ``bias.py:78``): corrects the sampled-softmax bias toward popular
    items. Attach as a head's ``post`` (operates on the Prediction's logits whose
    columns correspond to candidate ids in ``negative_candidate_ids``).
    """

    def __init__(self, item_frequencies: np.ndarray, reg_factor: float = 1.0):
        super().__init__()
        freqs = jnp.asarray(item_frequencies, jnp.float32)
        probs = freqs / jnp.maximum(jnp.sum(freqs), 1.0)
        self.log_probs = jnp.log(jnp.maximum(probs, 1e-12))
        self.reg_factor = reg_factor

    @classmethod
    def from_parquet(cls, path: str, frequency_col: str = "frequency", **kwargs):
        import pyarrow.parquet as pq

        table = pq.read_table(path)
        return cls(table.column(frequency_col).to_numpy(zero_copy_only=False), **kwargs)

    def correction(self, candidate_ids: jnp.ndarray) -> jnp.ndarray:
        return self.reg_factor * jnp.take(self.log_probs, candidate_ids, axis=0)

    def __call__(self, inputs, *, context=None, targets=None, **kwargs):
        if isinstance(inputs, Prediction):
            neg_ids = inputs.negative_candidate_ids
            if neg_ids is None:
                return inputs
            logits = inputs.outputs
            # column 0 is the positive; candidates follow
            corr = self.correction(neg_ids)
            corrected = logits.at[:, 1:].add(-corr[None, :] if corr.ndim == 1 else -corr)
            return inputs._replace(outputs=corrected)
        return inputs
