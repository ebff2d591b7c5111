from .base import InputBlock, InputBlockV2
from .continuous import Continuous, ContinuousEmbedding, ContinuousProjection
from .embedding import (
    AverageEmbeddingsByWeightFeature,
    EmbeddingFeatures,
    Embeddings,
    EmbeddingTable,
    PretrainedEmbeddings,
    SequenceEmbeddingFeatures,
)
from .dynamic import DynamicEmbeddingTable, string_id_hash
from .tt_embedding import TTEmbeddingTable
