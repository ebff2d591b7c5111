from .base import InputBlock, InputBlockV2
from .continuous import Continuous, ContinuousProjection
from .embedding import (
    AverageEmbeddingsByWeightFeature,
    Embeddings,
    EmbeddingTable,
    PretrainedEmbeddings,
)
