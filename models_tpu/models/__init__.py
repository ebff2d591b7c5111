from .base import BaseModel, Model, ModelBlock
from .retrieval import (
    MatrixFactorizationModel,
    MatrixFactorizationModelV2,
    RetrievalModelV2,
    TwoTowerModel,
    TwoTowerModelV2,
    YoutubeDNNRetrievalModel,
)
