from .base import BaseModel, Model, ModelBlock
from .benchmark import NCFModel
from .multi_task import MMOEModel, PLEModel
from .ranking import DCNModel, DeepFMModel, DLRMModel, WideAndDeepModel
from .retrieval import (
    MatrixFactorizationModel,
    MatrixFactorizationModelV2,
    RetrievalModelV2,
    TwoTowerModel,
    TwoTowerModelV2,
    YoutubeDNNRetrievalModel,
)
