"""models_tpu: a TPU-native (JAX/XLA/Pallas) recommender-model framework.

Schema-driven composable blocks, retrieval + ranking model zoo, contrastive
training, top-k evaluation, and mesh-sharded embeddings — the capabilities of
NVIDIA Merlin Models, redesigned for TPU.
"""

__version__ = "0.1.0"

from .api import MerlinModel
from .registry import Registry
from .schema import (
    ColumnSchema,
    Domain,
    Schema,
    Tags,
    create_categorical_column,
    create_continuous_column,
    infer_embedding_dim,
)

# core DSL
from .core import (
    AsTabular,
    Block,
    Cond,
    Debug,
    Filter,
    Lambda,
    MapValues,
    ModelContext,
    NoOp,
    ParallelBlock,
    Prediction,
    ResidualBlock,
    SequenceFeature,
    SequentialBlock,
    TopKPrediction,
    WithShortcut,
)
from .core.encoder import EmbeddingEncoder, Encoder, TopKEncoder
from .core.policy import get_dtype_policy, set_dtype_policy

# data plane
from .data import Dataset, Loader, generate_data, sample_batch

# inputs
from .inputs import (
    AverageEmbeddingsByWeightFeature,
    EmbeddingFeatures,
    SequenceEmbeddingFeatures,
    Continuous,
    ContinuousEmbedding,
    ContinuousProjection,
    DynamicEmbeddingTable,
    Embeddings,
    EmbeddingTable,
    InputBlock,
    InputBlockV2,
    PretrainedEmbeddings,
    TTEmbeddingTable,
    string_id_hash,
)

# blocks
from .blocks.retrieval import (
    DualEncoderBlock,
    ItemRetrievalScorer,
    MatrixFactorizationBlock,
    TowerBlock,
    TwoTowerBlock,
)
from .blocks import (
    BatchNorm,
    CGCBlock,
    Cross,
    CrossBlock,
    Dense,
    DenseResidualBlock,
    DLRMBlock,
    DotProductInteraction,
    Dropout,
    ExpertsGate,
    FMBlock,
    FMPairwiseInteraction,
    LayerNorm,
    MLPBlock,
    MMOEBlock,
    PLEBlock,
    XDeepFmOuterProduct,
)
from .blocks.optimizer import (
    LazyAdam,
    MultiOptimizer,
    SparseEmbeddingOptimizer,
    split_embeddings_on_size,
)

# outputs / heads / samplers
from .outputs import (
    BinaryClassificationTask,
    BinaryOutput,
    BruteForce,
    CachedCrossBatchSampler,
    Candidate,
    CandidateSampler,
    CategoricalOutput,
    CategoricalTarget,
    ColumnBasedSampleWeight,
    ContrastiveOutput,
    ContrastiveSampleWeight,
    DotProduct,
    EmbeddingTablePrediction,
    FIFOQueue,
    InBatchSampler,
    ItemRetrievalTask,
    LogitsTemperatureScaler,
    MultiClassClassificationTask,
    ModelOutput,
    OutputBlock,
    PopularityBasedSampler,
    PredictionTasks,
    RegressionOutput,
    RegressionTask,
    TopKLayer,
    TopKOutput,
)

# transforms
from .transforms import (
    BroadcastToSequence,
    CategoryEncoding,
    ExpandDims,
    ExtractMaskFromTargets,
    HashedCross,
    HashedCrossAll,
    InBatchNegatives,
    L2Norm,
    PopularityLogitsCorrection,
    PrepareFeatures,
    ReplaceMaskedEmbeddings,
    SequenceMaskLast,
    SequenceMaskLastInference,
    SequenceMaskRandom,
    SequencePredictLast,
    SequencePredictNext,
    SequencePredictRandom,
    SequenceTargetAsInput,
    StochasticSwapNoise,
    ToTarget,
)

# metrics & losses
from . import losses
from .metrics import (
    AUC,
    Metric,
    AvgPrecisionAt,
    BinaryAccuracy,
    ItemCoverageAt,
    LogLoss,
    MAE,
    MRRAt,
    NDCGAt,
    NoveltyAt,
    PopularityBiasAt,
    Precision,
    PrecisionAt,
    RecallAt,
    Recall,
    RMSE,
    TopKMetric,
    TopKMetricsAggregator,
)

# models
from .models import (
    BaseModel,
    DCNModel,
    DeepFMModel,
    DLRMModel,
    MatrixFactorizationModel,
    MatrixFactorizationModelV2,
    MMOEModel,
    Model,
    ModelBlock,
    NCFModel,
    PLEModel,
    RetrievalModelV2,
    TwoTowerModel,
    TwoTowerModelV2,
    WideAndDeepModel,
    YoutubeDNNRetrievalModel,
)
from .models.session import SessionBasedTransformerModel

# transformers
from .outputs import NextItemPredictionTask
from .transformer.block import (
    AlbertBlock,
    BertBlock,
    GPT2Block,
    LastHiddenState,
    RobertaBlock,
    AttentionWeights,
    HiddenStates,
    PoolerOutput,
    SequenceSummary,
    TransformerBlock,
    TransformerInferenceHiddenState,
    XLNetBlock,
)

# distribution
from .parallel.mesh import make_mesh
from .parallel import distributed

# persistence
from .utils.io import export_serving, load_model, load_serving, save_model
from .compat import (
    ConcatFeatures,
    ContinuousFeatures,
    ElementwiseSum,
    ElementwiseSumItemMulti,
    EmbeddingOptions,
    EmbeddingWithMetadata,
    FeatureConfig,
    InBatchSamplerV2,
    IndexBlock,
    ItemSampler,
    LogLossMetric,
    ParallelPredictionBlock,
    PopularityBasedSamplerV2,
    PredictionTask,
    PrepareListFeatures,
    QueryItemIdsEmbeddingsBlock,
    RetrievalModel,
    SequenceAggregator,
    StackFeatures,
    TableConfig,
    TabularBlock,
    TensorInitializer,
    ToDense,
    ToOneHot,
    ToSparse,
    TopKIndexBlock,
    YoutubeDNNRetrievalModelV2,
    is_transformers_available,
    right_shift_layer,
)
