from .block import Block, Debug, Lambda, NoOp, as_block, call_block
from .combinators import (
    AsTabular,
    Cond,
    Filter,
    MapValues,
    ParallelBlock,
    ResidualBlock,
    SequentialBlock,
    WithShortcut,
)
from .types import ModelContext, Prediction, SequenceFeature, TopKPrediction
