from .mlp import (
    BatchNorm,
    Dense,
    DenseMaybeLowRank,
    DenseResidualBlock,
    Dropout,
    LayerNorm,
    MLPBlock,
)
