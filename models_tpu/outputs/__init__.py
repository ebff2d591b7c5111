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
from .contrastive import ContrastiveOutput, ContrastiveSampleWeight
from .sampling import Candidate, CandidateSampler, InBatchSampler, PopularityBasedSampler
from .topk import BruteForce, TopKLayer, TopKOutput
from .queue import CachedCrossBatchSampler, FIFOQueue

# V1-style task-name aliases (reference tf/prediction_tasks/*): same heads,
# familiar names for users migrating from the reference's V1 API
from .base import BinaryOutput as BinaryClassificationTask
from .base import CategoricalOutput as MultiClassClassificationTask
from .base import RegressionOutput as RegressionTask
from .contrastive import ContrastiveOutput as ItemRetrievalTask
from .tasks import NextItemPredictionTask, ParallelPredictionBlock, PredictionTasks
