from .dataset import Dataset
from .loader import Loader, sample_batch
from .synthetic import generate_data, known_schema, KNOWN_DATASETS
from . import datasets
from .datasets import (
    get_aliccp,
    get_booking,
    get_criteo,
    get_dressipi2022,
    get_ecommerce_transactions,
    get_movielens,
    get_sigir,
    get_tenrec,
)

__all__ = [
    "Dataset", "Loader", "sample_batch", "generate_data", "known_schema",
    "KNOWN_DATASETS", "datasets", "get_movielens", "get_criteo", "get_aliccp",
    "get_booking", "get_dressipi2022", "get_sigir", "get_tenrec",
    "get_ecommerce_transactions",
]
