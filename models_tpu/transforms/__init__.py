from .bias import LogitsTemperatureScaler, PopularityLogitsCorrection
from .features import (
    BroadcastToSequence,
    CategoryEncoding,
    ExpandDims,
    HashedCross,
    HashedCrossAll,
    PrepareFeatures,
    ToTarget,
)
from .negative_sampling import InBatchNegatives
from .noise import StochasticSwapNoise
from .regularization import L2Norm
from .sequence import (
    ExtractMaskFromTargets,
    ReplaceMaskedEmbeddings,
    SequenceMaskLast,
    SequenceMaskLastInference,
    SequenceMaskRandom,
    SequencePredictLast,
    SequencePredictNext,
    SequencePredictRandom,
    SequenceTargetAsInput,
)
