from .base import (
    BinaryOutput,
    CategoricalOutput,
    CategoricalTarget,
    ColumnBasedSampleWeight,
    DotProduct,
    EmbeddingTablePrediction,
    LogitsTemperatureScaler,
    ModelOutput,
    OutputBlock,
    RegressionOutput,
)
from .contrastive import ContrastiveOutput
from .sampling import Candidate, CandidateSampler, InBatchSampler, PopularityBasedSampler
from .topk import BruteForce, TopKLayer, TopKOutput
from .queue import CachedCrossBatchSampler, FIFOQueue
