"""models_tpu: a TPU-native (JAX/XLA/Pallas) recommender-model framework.

Schema-driven composable blocks, retrieval + ranking model zoo, contrastive
training, top-k evaluation, and mesh-sharded embeddings — the capabilities of
NVIDIA Merlin Models, redesigned for TPU.
"""

__version__ = "0.1.0"

from .schema import (
    ColumnSchema,
    Domain,
    Schema,
    Tags,
    create_categorical_column,
    create_continuous_column,
    infer_embedding_dim,
)
from .registry import Registry
