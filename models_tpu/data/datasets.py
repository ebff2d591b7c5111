"""Named dataset accessors (reference ``merlin/datasets/{entertainment,advertising,
ecommerce}`` — get_movielens:40, get_criteo:39, get_aliccp:43).

The reference downloads + runs NVTabular workflows. This environment has no
egress, so the contract is: if ``path`` contains prepared parquet data (with a
schema sidecar — e.g. produced by NVTabular, whose schema.json we read natively),
load it; otherwise synthesize data from the stored schema so every pipeline runs
end-to-end anywhere. ``variant="raw"`` accessors also handle the classic raw
formats (MovieLens ``ratings.dat``/``u.data``) when present locally.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..schema import Schema, Tags
from .dataset import Dataset
from .synthetic import generate_data, known_schema


def _from_path_or_synthetic(path, name: str, num_rows: int, seed: int = 42):
    if path is not None:
        train_p = os.path.join(path, "train")
        valid_p = os.path.join(path, "valid")
        if os.path.isdir(train_p) and os.path.isdir(valid_p):
            return Dataset.from_parquet(train_p), Dataset.from_parquet(valid_p)
        if os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path)):
            ds = Dataset.from_parquet(path)
            train, valid = ds.split([0.8, 0.2], seed=seed)
            return train, valid
    train, valid = generate_data(name, num_rows=num_rows, set_sizes=(0.8, 0.2), seed=seed)
    return train, valid


def get_movielens(
    path: Optional[str] = None, variant: str = "ml-100k", num_rows: int = 100_000
) -> Tuple[Dataset, Dataset]:
    """MovieLens 100k / 25M (reference ``entertainment/movielens/dataset.py:40``)."""
    name = {"ml-100k": "movielens-100k", "ml-25m": "movielens-25m"}.get(variant, variant)
    if path is not None:
        raw = _load_movielens_raw(path, variant)
        if raw is not None:
            return raw
    return _from_path_or_synthetic(path, name, num_rows)


def _load_movielens_raw(path: str, variant: str):
    """Parse classic raw MovieLens files when present (u.data / ratings.csv)."""
    udata = os.path.join(path, "u.data")
    ratings_csv = os.path.join(path, "ratings.csv")
    if os.path.exists(udata):
        arr = np.loadtxt(udata, dtype=np.int64)
        users, items, ratings = arr[:, 0], arr[:, 1], arr[:, 2]
    elif os.path.exists(ratings_csv):
        arr = np.genfromtxt(ratings_csv, delimiter=",", skip_header=1)
        users, items, ratings = arr[:, 0].astype(np.int64), arr[:, 1].astype(np.int64), arr[:, 2]
    else:
        return None
    from ..schema import create_categorical_column, ColumnSchema

    schema = Schema(
        [
            create_categorical_column("userId", int(users.max()), tags=(Tags.USER, Tags.USER_ID)),
            create_categorical_column("movieId", int(items.max()), tags=(Tags.ITEM, Tags.ITEM_ID)),
            ColumnSchema("rating", tags=(Tags.REGRESSION, Tags.TARGET), dtype="float32"),
            ColumnSchema("rating_binary", tags=(Tags.BINARY_CLASSIFICATION, Tags.TARGET), dtype="int32"),
        ]
    )
    data = {
        "userId": users.astype(np.int32),
        "movieId": items.astype(np.int32),
        "rating": ratings.astype(np.float32),
        "rating_binary": (ratings >= 4).astype(np.int32),
    }
    ds = Dataset(data, schema=schema)
    train, valid = ds.split([0.8, 0.2], seed=42)
    return train, valid


def get_criteo(path: Optional[str] = None, num_rows: int = 100_000) -> Tuple[Dataset, Dataset]:
    """Criteo 1TB CTR (reference ``advertising/criteo/dataset.py:39``)."""
    return _from_path_or_synthetic(path, "criteo", num_rows)


def get_aliccp(path: Optional[str] = None, num_rows: int = 100_000) -> Tuple[Dataset, Dataset]:
    """Ali-CCP CTR/CVR (reference ``ecommerce/aliccp/dataset.py:43``)."""
    return _from_path_or_synthetic(path, "aliccp", num_rows)


def get_booking(path: Optional[str] = None, num_rows: int = 50_000) -> Tuple[Dataset, Dataset]:
    """Booking.com next-destination dataset (reference
    ``merlin/datasets/ecommerce/booking``): per-trip city sequences. With no
    ``path`` (no egress in this environment) a synthetic dataset with the real
    schema layout is generated."""
    return _from_path_or_synthetic(path, "booking", num_rows)
