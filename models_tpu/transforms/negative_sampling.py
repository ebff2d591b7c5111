"""In-batch negative data augmentation
(reference ``merlin/models/tf/transforms/negative_sampling.py:29``).

Unlike the contrastive head's samplers (which synthesize *logits*), this
transform augments the *batch*: for every positive example it appends rows
pairing the same user/context features with other items from the batch, labeled
0 — the trick used to train binary ranking models without logged negatives.
Static-shape version: ``n_per_positive`` is fixed, and the batch grows by a
constant factor (XLA-friendly; the reference's ragged version grows dynamically).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.block import Block
from ..core.types import SequenceFeature, TensorDict
from ..schema import Schema, Tags


class InBatchNegatives(Block):
    def __init__(self, schema: Schema, n_per_positive: int = 1, seed: int = 0,
                 targets_to_zero: Optional[list] = None):
        super().__init__(schema=schema)
        self.n = int(n_per_positive)
        self.seed = seed
        self.item_cols = schema.select_by_tag(Tags.ITEM).column_names
        self.target_cols = targets_to_zero or schema.targets.column_names

    def __call__(self, inputs: TensorDict, *, targets=None, context=None, training=True, **kw):
        if not training:
            return (inputs, targets) if targets is not None else inputs
        step = context.get("step", 0) if context is not None else 0
        some = next(v for v in inputs.values() if hasattr(v, "shape"))
        B = some.shape[0]
        key = jax.random.fold_in(jax.random.key(self.seed), jnp.asarray(step, jnp.uint32))
        # for each of n copies, a batch permutation supplying the negative items
        perms = jax.random.randint(key, (self.n, B), 0, B)

        def tile_feature(name, v):
            def index_rows(x, idx):
                return x[idx]

            copies = [v]
            for i in range(self.n):
                if name in self.item_cols:
                    if isinstance(v, SequenceFeature):
                        copies.append(SequenceFeature(v.values[perms[i]], v.mask[perms[i]]))
                    else:
                        copies.append(v[perms[i]])
                else:
                    copies.append(v)
            if isinstance(v, SequenceFeature):
                return SequenceFeature(
                    jnp.concatenate([c.values for c in copies], axis=0),
                    jnp.concatenate([c.mask for c in copies], axis=0),
                )
            return jnp.concatenate(copies, axis=0)

        out = {name: tile_feature(name, v) for name, v in inputs.items()}

        new_targets = targets
        if isinstance(targets, dict):
            new_targets = {}
            for name, t in targets.items():
                zeros = jnp.zeros((self.n * B,) + t.shape[1:], dtype=t.dtype)
                new_targets[name] = jnp.concatenate([t, zeros], axis=0)
        elif targets is not None:
            zeros = jnp.zeros((self.n * B,) + targets.shape[1:], dtype=targets.dtype)
            new_targets = jnp.concatenate([targets, zeros], axis=0)
        if context is not None and new_targets is not None:
            context.targets = new_targets
        return out, new_targets
