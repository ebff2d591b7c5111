from .features import (
    BroadcastToSequence,
    CategoryEncoding,
    ExpandDims,
    HashedCross,
    HashedCrossAll,
    PrepareFeatures,
    ToTarget,
)
from .regularization import L2Norm
