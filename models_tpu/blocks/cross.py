"""DCN-v2 cross layers (reference ``merlin/models/tf/blocks/cross.py:29-221``).

``x_{l+1} = x0 * (W x_l + b) + x_l`` — each layer is one d×d (or low-rank d×r×d)
matmul fused with the elementwise multiply/add by XLA.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..core.block import Block
from ..core.combinators import SequentialBlock
from .mlp import DenseMaybeLowRank


class Cross(Block):
    def __init__(self, low_rank_dim: Optional[int] = None, seed: int = 0):
        super().__init__()
        self.dense = DenseMaybeLowRank(low_rank_dim=low_rank_dim, seed=seed)

    def __call__(self, inputs, **kwargs):
        if isinstance(inputs, tuple):
            x0, x = inputs
        else:
            x0 = x = inputs
        out = x0 * self.dense(x) + x
        return (x0, out)


class _TakeCrossOutput(Block):
    def __call__(self, inputs, **kwargs):
        return inputs[1] if isinstance(inputs, tuple) else inputs


def CrossBlock(
    depth: int = 1,
    low_rank_dim: Optional[int] = None,
    seed: int = 0,
    block_name: str = "CrossBlock",
) -> SequentialBlock:
    """Stack of ``depth`` cross layers threading (x0, x_l)."""
    if depth < 1:
        raise ValueError(f"CrossBlock depth must be >= 1, got {depth}")
    layers = [Cross(low_rank_dim=low_rank_dim, seed=seed + i) for i in range(depth)]
    return SequentialBlock(layers + [_TakeCrossOutput()], block_name=block_name)
