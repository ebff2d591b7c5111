from .cross import Cross, CrossBlock
from .dlrm import DLRMBlock
from .experts import CGCBlock, ExpertsGate, MMOEBlock, PLEBlock
from .interaction import (
    DotProductInteraction,
    FMBlock,
    FMPairwiseInteraction,
    XDeepFmOuterProduct,
)
from .mlp import (
    BatchNorm,
    Dense,
    DenseMaybeLowRank,
    DenseResidualBlock,
    Dropout,
    LayerNorm,
    MLPBlock,
)
from .retrieval import (
    DualEncoderBlock,
    ItemRetrievalScorer,
    MatrixFactorizationBlock,
    TowerBlock,
    TwoTowerBlock,
)
