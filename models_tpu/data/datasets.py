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
    name = {"ml-100k": "movielens-100k", "ml-1m": "movielens-1m", "ml-25m": "movielens-25m"}.get(variant, variant)
    if path is not None:
        raw = _load_movielens_raw(path, variant)
        if raw is not None:
            return raw
    return _from_path_or_synthetic(path, name, num_rows)


def _load_movielens_raw(path: str, variant: str):
    """Parse classic raw MovieLens files when present: 100k ``u.data`` (TSV),
    1M ``ratings.dat`` (``::``-separated), 25M ``ratings.csv``."""
    udata = os.path.join(path, "u.data")
    ratings_dat = os.path.join(path, "ratings.dat")
    ratings_csv = os.path.join(path, "ratings.csv")
    if os.path.exists(udata):
        arr = np.loadtxt(udata, dtype=np.int64)
        users, items, ratings = arr[:, 0], arr[:, 1], arr[:, 2]
    elif os.path.exists(ratings_dat):
        rows = []
        with open(ratings_dat) as fh:
            for line in fh:
                parts = line.strip().split("::")
                if len(parts) >= 3:
                    rows.append((int(parts[0]), int(parts[1]), float(parts[2])))
        if not rows:
            return None
        arr = np.asarray(rows)
        users, items, ratings = arr[:, 0].astype(np.int64), arr[:, 1].astype(np.int64), arr[:, 2]
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


def get_criteo(
    path: Optional[str] = None,
    num_rows: int = 100_000,
    num_buckets: int = 10_000_000,
    max_rows: Optional[int] = None,
) -> Tuple[Dataset, Dataset]:
    """Criteo 1TB CTR (reference ``advertising/criteo/dataset.py:39``).

    With ``path`` containing raw ``day_*`` TSV files (optionally .gz), parses
    them natively: label + 13 int features (missing → 0) + 26 hex categoricals
    hashed into ``num_buckets`` (the reference's ``Categorify(max_size=1e7)``
    cap), reading at most ``max_rows or num_rows`` rows (day_0 alone is ~45 GB
    — an unbounded parse would OOM the host). Otherwise prepared parquet /
    synthetic fallback."""
    if path is not None:
        raw = _load_criteo_raw(path, num_buckets=num_buckets, max_rows=max_rows or num_rows)
        if raw is not None:
            return raw
    return _from_path_or_synthetic(path, "criteo", num_rows)


def _load_criteo_raw(path: str, num_buckets: int, max_rows: Optional[int]):
    import glob as _glob
    import gzip

    files = sorted(
        _glob.glob(os.path.join(path, "day_*[0-9]")) + _glob.glob(os.path.join(path, "day_*.gz"))
    )
    if not files:
        return None
    labels, ints, cats = [], [], []
    n = 0
    for f in files:
        opener = gzip.open if f.endswith(".gz") else open
        with opener(f, "rt") as fh:
            for line in fh:
                parts = line.rstrip("\n").split("\t")
                if len(parts) != 40:
                    continue
                labels.append(int(parts[0]))
                ints.append([int(v) if v else 0 for v in parts[1:14]])
                cats.append([int(v, 16) % num_buckets if v else 0 for v in parts[14:40]])
                n += 1
                if max_rows and n >= max_rows:
                    break
        if max_rows and n >= max_rows:
            break
    if not n:
        return None
    from ..schema import ColumnSchema, create_categorical_column

    cols = {"label": np.asarray(labels, np.int32)}
    schema_cols = [
        ColumnSchema("label", tags=(Tags.BINARY_CLASSIFICATION, Tags.TARGET), dtype="int32")
    ]
    ints = np.asarray(ints, np.float32)
    cats = np.asarray(cats, np.int64)
    for i in range(13):
        name = f"I{i + 1}"
        cols[name] = ints[:, i]
        schema_cols.append(ColumnSchema(name, tags=(Tags.CONTINUOUS,), dtype="float32"))
    for i in range(26):
        name = f"C{i + 1}"
        cols[name] = cats[:, i]
        schema_cols.append(create_categorical_column(name, num_buckets - 1))
    ds = Dataset(cols, schema=Schema(schema_cols))
    return ds.split([0.8, 0.2], seed=42)


def get_aliccp(
    path: Optional[str] = None, num_rows: int = 100_000, max_rows: Optional[int] = None
) -> Tuple[Dataset, Dataset]:
    """Ali-CCP CTR/CVR (reference ``ecommerce/aliccp/dataset.py:43``).

    With ``path`` containing the raw release layout
    (``{train,test}/sample_skeleton_{train,test}.csv`` +
    ``common_features_{train,test}.csv``), parses it natively — the same
    ``\\x01``-separated ``field:feat:value`` triplet format and field-id →
    feature-name mapping as the reference (``dataset.py:279-361``)."""
    if path is not None:
        raw = _load_aliccp_raw(path, max_rows=max_rows)
        if raw is not None:
            return raw
    return _from_path_or_synthetic(path, "aliccp", num_rows)


# field-id -> column name (reference ``aliccp/dataset.py:279-357`` _Features;
# scalar fields only — the multi-valued *_14 history fields keep last value,
# matching the reference's dict(zip) behavior)
_ALICCP_FIELDS = {
    "101": ("user_id", (Tags.USER, Tags.USER_ID)),
    "121": ("user_profile", (Tags.USER,)),
    "122": ("user_group", (Tags.USER,)),
    "124": ("user_gender", (Tags.USER,)),
    "125": ("user_age", (Tags.USER,)),
    "126": ("user_consumption_1", (Tags.USER,)),
    "127": ("user_consumption_2", (Tags.USER,)),
    "128": ("user_is_occupied", (Tags.USER,)),
    "129": ("user_geography", (Tags.USER,)),
    "205": ("item_id", (Tags.ITEM, Tags.ITEM_ID)),
    "206": ("item_category", (Tags.ITEM,)),
    "207": ("item_shop", (Tags.ITEM,)),
    "210": ("item_intention", (Tags.ITEM,)),
    "216": ("item_brand", (Tags.ITEM,)),
    "301": ("position", ()),
}


def _parse_aliccp_kv(field_str: str):
    kv = field_str.split("\x01")
    out = {}
    for triplet in kv:
        parts = triplet.split(":")
        if len(parts) >= 2:
            out[parts[0]] = parts[1]
    return out


def _load_aliccp_split(base: str, data_type: str, max_rows: Optional[int]):
    skel = os.path.join(base, data_type, f"sample_skeleton_{data_type}.csv")
    commf = os.path.join(base, data_type, f"common_features_{data_type}.csv")
    if not (os.path.exists(skel) and os.path.exists(commf)):
        return None
    # pass 1: skeleton rows (bounded by max_rows) + the common keys they reference
    rows = []
    needed = set()
    with open(skel) as fh:
        for i, line in enumerate(fh):
            if max_rows and i >= max_rows:
                break
            parts = line.strip().split(",")
            if len(parts) < 6:
                continue
            if parts[1] == "0" and parts[2] == "1":
                continue  # reference drops click=0,conversion=1 rows
            feats = _parse_aliccp_kv(parts[5])
            feats["click"] = parts[1]
            feats["conversion"] = parts[2]
            feats["__common__"] = parts[3]
            needed.add(parts[3])
            rows.append(feats)
    # pass 2: only referenced common-feature lines are parsed (the full file is
    # multiple GB in the real release; a bounded read must stay bounded)
    common = {}
    with open(commf) as fh:
        for line in fh:
            parts = line.strip().split(",")
            if len(parts) >= 3 and parts[0] in needed:
                common[parts[0]] = _parse_aliccp_kv(parts[2])
                if len(common) == len(needed):
                    break
    for feats in rows:
        # common features override skeleton values (reference dict.update order)
        feats.update(common.get(feats.pop("__common__"), {}))
    return rows


def _load_aliccp_raw(path: str, max_rows: Optional[int]):
    train_rows = _load_aliccp_split(path, "train", max_rows)
    test_rows = _load_aliccp_split(path, "test", max_rows)
    if not train_rows:
        return None
    from ..schema import ColumnSchema, create_categorical_column

    def build(rows, cards):
        cols = {
            "click": np.asarray([int(r["click"]) for r in rows], np.int32),
            "conversion": np.asarray([int(r["conversion"]) for r in rows], np.int32),
        }
        for fid, (name, _) in _ALICCP_FIELDS.items():
            vals = np.asarray([int(r.get(fid, 0)) for r in rows], np.int64)
            cols[name] = vals
            cards[name] = max(cards.get(name, 0), int(vals.max()))
        return cols

    cards: dict = {}
    train_cols = build(train_rows, cards)
    test_cols = build(test_rows or [], cards) if test_rows else None
    schema_cols = [
        ColumnSchema("click", tags=(Tags.BINARY_CLASSIFICATION, Tags.TARGET), dtype="int32"),
        ColumnSchema("conversion", tags=(Tags.BINARY_CLASSIFICATION, Tags.TARGET), dtype="int32"),
    ]
    for fid, (name, tags) in _ALICCP_FIELDS.items():
        schema_cols.append(create_categorical_column(name, cards[name], tags=tags))
    schema = Schema(schema_cols)
    train = Dataset(train_cols, schema=schema)
    if test_cols is not None:
        return train, Dataset(test_cols, schema=schema)
    return train.split([0.8, 0.2], seed=42)


def get_booking(path: Optional[str] = None, num_rows: int = 50_000) -> Tuple[Dataset, Dataset]:
    """Booking.com next-destination dataset (reference
    ``merlin/datasets/ecommerce/booking``): per-trip city sequences. With no
    ``path`` (no egress in this environment) a synthetic dataset with the real
    schema layout is generated."""
    return _from_path_or_synthetic(path, "booking", num_rows)
