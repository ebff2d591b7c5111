"""DLRM block (reference ``merlin/models/tf/blocks/dlrm.py:32-171``).

continuous → bottom MLP (projected to the shared embedding dim) ‖ categorical →
equal-dim embeddings → stack (B, F+1, D) → pairwise dot interaction → concat with
bottom output (shortcut) → top MLP. All compute is embedding gathers + one batched
gram matmul + dense matmuls: MXU-dominant by construction.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from ..core.aggregation import StackFeatures
from ..core.block import Block
from ..core.combinators import Filter, ParallelBlock, SequentialBlock
from ..core.types import TensorDict
from ..inputs.continuous import Continuous
from ..inputs.embedding import Embeddings
from ..schema import Schema, Tags
from .interaction import DotProductInteraction
from .mlp import MLPBlock


class DLRMBlock(Block):
    def __init__(
        self,
        schema: Schema,
        embedding_dim: int,
        bottom_block: Optional[Block] = None,
        top_block: Optional[Block] = None,
        self_interaction: bool = False,
        seed: int = 0,
    ):
        super().__init__(schema=schema.excluding_by_tag(Tags.TARGET))
        cat = self.schema.categorical
        cont = self.schema.continuous
        if not len(cat):
            raise ValueError("DLRM needs categorical features")
        # fused=True: one gather for all scalar categorical features (a DLRM with
        # 26 criteo features is otherwise op-count-bound, not MXU-bound)
        self.embeddings = Embeddings(
            cat, dim=embedding_dim, sequence_combiner="mean", seed=seed, fused=True
        )
        self.continuous = Continuous(cont) if len(cont) else None
        if self.continuous is not None and bottom_block is None:
            bottom_block = MLPBlock([embedding_dim * 2, embedding_dim], seed=seed)
        self.bottom = bottom_block
        self.interaction = DotProductInteraction(self_interaction=self_interaction)
        self.top = top_block
        self.embedding_dim = embedding_dim
        self.stack = StackFeatures(axis=1)

    def __call__(self, inputs: TensorDict, *, training=False, context=None, **kwargs):
        parts = dict(self.embeddings(inputs))
        bottom_out = None
        if self.continuous is not None:
            cont = self.continuous(inputs)
            x = jnp.concatenate([v for _, v in sorted(cont.items())], axis=-1)
            bottom_out = self.bottom(x, training=training) if self.bottom is not None else x
            if bottom_out.shape[-1] != self.embedding_dim:
                raise ValueError(
                    f"bottom block output dim {bottom_out.shape[-1]} != embedding_dim "
                    f"{self.embedding_dim}"
                )
            parts["__bottom__"] = bottom_out
        stacked = self.stack(parts)  # (B, F[+1], D)
        interactions = self.interaction(stacked)
        if bottom_out is not None:
            # shortcut concat of the bottom MLP output (reference dlrm.py:150)
            interactions = jnp.concatenate([bottom_out, interactions], axis=-1)
        if self.top is not None:
            return self.top(interactions, training=training)
        return interactions
