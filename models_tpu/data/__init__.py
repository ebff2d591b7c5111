from .dataset import Dataset
from .loader import Loader, sample_batch
from .synthetic import generate_data, known_schema, KNOWN_DATASETS

__all__ = ["Dataset", "Loader", "sample_batch", "generate_data", "known_schema", "KNOWN_DATASETS"]
from . import datasets
