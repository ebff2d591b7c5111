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
from typing import Dict, Optional, Tuple

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


def movielens_100k_workflow() -> "object":
    """The reference's default ml-100k NVTabular workflow re-stated over
    :mod:`models_tpu.data.workflow` ops (reference
    ``entertainment/movielens/dataset.py:324-460``): Categorify ids + genres +
    demographics, target-encode movieId vs rating (kfold=5, p_smooth=20,
    normalized), log-count-encode userId, bucketize age by decade, and emit
    ``rating``/``rating_binary`` targets."""
    from .workflow import (
        Bucketize, Categorify, GroupbyCount, LambdaOp, TargetEncoding, Workflow,
    )

    return Workflow(
        [
            Categorify(["movieId", "userId", "genres", "gender", "zip_code"]),
            TargetEncoding("movieId", target="rating", kfold=5, p_smooth=20.0,
                           out="TE_movieId_rating", normalize=True, tags=Tags.ITEM),
            GroupbyCount("userId", log=True, out="userId_count", tags=Tags.USER),
            Bucketize({"age": [0, 10, 20, 30, 40, 50, 60, 70, 80, 90]}, tags=Tags.USER),
            LambdaOp("rating", lambda v: (v > 3).astype("int32"), out="rating_binary",
                     tags=("binary_classification", "target"), dtype="int32"),
            LambdaOp("rating", lambda v: v.astype("float32"),
                     tags=("regression", "target"), dtype="float32"),
        ]
    )


_ML100K_GENRES = [
    "unknown", "Action", "Adventure", "Animation", "Childrens", "Comedy",
    "Crime", "Documentary", "Drama", "Fantasy", "Film_Noir", "Horror",
    "Musical", "Mystery", "Romance", "Sci-Fi", "Thriller", "War", "Western",
]


def _load_movielens_100k_full(path: str):
    """Full raw ml-100k preparation when the side files are present
    (``u.user``, ``u.item``, ``ua.base``/``ua.test``): joins demographics and
    genre strings like the reference, then runs
    :func:`movielens_100k_workflow` — ``get_movielens(path)`` returns
    model-ready data from the raw download."""
    import pandas as pd

    u_user = os.path.join(path, "u.user")
    u_item = os.path.join(path, "u.item")
    ua_base = os.path.join(path, "ua.base")
    ua_test = os.path.join(path, "ua.test")
    if not (os.path.exists(u_user) and os.path.exists(u_item)):
        return None
    users = pd.read_csv(
        u_user, names=["userId", "age", "gender", "occupation", "zip_code"], sep="|"
    )
    movies = pd.read_csv(
        u_item,
        names=["movieId", "title", "release_date", "video_release_date", "imdb_URL"]
        + _ML100K_GENRES,
        sep="|", encoding="latin1",
    )
    flags = movies[_ML100K_GENRES].astype(bool)
    movies["genres"] = [
        ",".join([g for g, on in zip(_ML100K_GENRES, row) if on])
        for row in flags.to_numpy()
    ]
    movies = movies[["movieId", "title", "genres"]]

    names = ["userId", "movieId", "rating", "timestamp"]
    if os.path.exists(ua_base) and os.path.exists(ua_test):
        train_df = pd.read_csv(ua_base, names=names, sep="\t")
        valid_df = pd.read_csv(ua_test, names=names, sep="\t")
    else:
        all_df = pd.read_csv(os.path.join(path, "u.data"), names=names, sep="\t")
        all_df = all_df.sample(frac=1.0, random_state=42).reset_index(drop=True)
        n_valid = int(len(all_df) * 0.2)
        train_df, valid_df = all_df[:-n_valid], all_df[-n_valid:]

    def prep(df):
        df = df.merge(users, on="userId", how="left")
        df = df.merge(movies, on="movieId", how="left")
        data = {c: np.asarray(df[c]) for c in
                ["userId", "movieId", "rating", "age", "gender", "zip_code",
                 "genres", "title"]}
        from ..schema import ColumnSchema, create_continuous_column

        cols = [
            ColumnSchema("userId", dtype="int64"),
            ColumnSchema("movieId", dtype="int64"),
            create_continuous_column("rating"),
            create_continuous_column("age"),
            ColumnSchema("gender", dtype="bytes"),
            ColumnSchema("zip_code", dtype="bytes"),
            ColumnSchema("genres", dtype="bytes"),
            ColumnSchema("title", dtype="bytes"),
        ]
        return Dataset(data, schema=Schema(cols))

    wf = movielens_100k_workflow()
    train = wf.fit_transform(prep(train_df))
    valid = wf.transform(prep(valid_df))

    # id-tag the categorified key columns (TagAsItemID/TagAsUserID)
    def retag(ds):
        cols = []
        for c in ds.schema:
            if c.name == "movieId":
                cols.append(c.with_tags((Tags.ITEM, Tags.ITEM_ID)))
            elif c.name == "userId":
                cols.append(c.with_tags((Tags.USER, Tags.USER_ID)))
            elif c.name in ("genres",):
                cols.append(c.with_tags((Tags.ITEM,)))
            else:
                cols.append(c)
        return Dataset({n: np.asarray(ds.to_table()[n]) for n in ds.to_table().column_names},
                       schema=Schema(cols))

    return retag(train), retag(valid)


def movielens_1m_workflow() -> "object":
    """The reference's ml-1m ETL re-stated over :mod:`models_tpu.data.workflow`
    ops (reference ``entertainment/movielens/dataset.py:226-322``,
    ``default_ml1m_transformation``): Categorify ids + demographics, target-
    encode movieId/userId/age/gender/occupation/zipcode against rating
    (kfold=5, p_smooth=20, normalized; user/item tagged as the reference
    tags them), and emit ``rating``/``rating_binary`` targets. Genres are
    encoded as a list feature OUTSIDE the workflow (see
    :func:`_encode_genres_list`)."""
    from .workflow import Categorify, LambdaOp, TargetEncoding, Workflow

    te = dict(target="rating", kfold=5, p_smooth=20.0, normalize=True)
    return Workflow(
        [
            Categorify(["movieId", "userId", "gender", "age", "occupation", "zipcode"]),
            TargetEncoding("movieId", out="TE_movieId_rating", tags=Tags.ITEM, **te),
            TargetEncoding("userId", out="TE_userId_rating", tags=Tags.USER, **te),
            TargetEncoding("age", out="TE_age_rating", tags=Tags.USER, **te),
            TargetEncoding("gender", out="TE_gender_rating", tags=Tags.USER, **te),
            TargetEncoding("occupation", out="TE_occupation_rating", tags=Tags.USER, **te),
            TargetEncoding("zipcode", out="TE_zipcode_rating", tags=Tags.USER, **te),
            LambdaOp("rating", lambda v: (v > 3).astype("int32"), out="rating_binary",
                     tags=("binary_classification", "target"), dtype="int32"),
            LambdaOp("rating", lambda v: v.astype("float32"),
                     tags=("regression", "target"), dtype="float32"),
        ]
    )


def movielens_25m_workflow() -> "object":
    """The reference's ml-25m ETL (reference ``dataset.py:159-222``,
    ``default_ml25m_transformation``): Categorify ids, normalized
    TE_movieId_rating (item), log count-encode userId (user),
    ``rating``/``rating_binary`` targets; genres list handled outside."""
    from .workflow import Categorify, GroupbyCount, LambdaOp, TargetEncoding, Workflow

    return Workflow(
        [
            Categorify(["movieId", "userId"]),
            TargetEncoding("movieId", target="rating", kfold=5, p_smooth=20.0,
                           out="TE_movieId_rating", normalize=True, tags=Tags.ITEM),
            GroupbyCount("userId", log=True, out="userId_count", tags=Tags.USER),
            LambdaOp("rating", lambda v: (v > 3).astype("int32"), out="rating_binary",
                     tags=("binary_classification", "target"), dtype="int32"),
            LambdaOp("rating", lambda v: v.astype("float32"),
                     tags=("regression", "target"), dtype="float32"),
        ]
    )


def _encode_genres_list(genre_strs, vocab=None):
    """``"A|B|C"`` strings → (list-of-int-ids, vocab). Id 0 is OOV/empty —
    the NVTabular Categorify convention the rest of the stack assumes."""
    lists = [s.split("|") if isinstance(s, str) and s else [] for s in genre_strs]
    if vocab is None:
        from collections import Counter

        counts = Counter(g for row in lists for g in row)
        vocab = {g: i + 1 for i, (g, _) in enumerate(counts.most_common())}
    ids = [[vocab.get(g, 0) for g in row] for row in lists]
    return ids, vocab


def _movielens_join_and_transform(train_df, valid_df, workflow, genre_col=None,
                                  genre_vocab_size=None, max_genres=8):
    """Shared tail of the 1m/25m loaders: run the workflow on the joined
    frames, re-tag id columns, and attach the genres list feature."""
    import pyarrow as pa

    from ..schema import ColumnSchema, create_categorical_column, create_continuous_column

    def to_ds(df):
        scalar_cols = [c for c in df.columns if c != "genres"]
        data = {c: np.asarray(df[c]) for c in scalar_cols}
        cols = []
        for c in scalar_cols:
            a = data[c]
            if a.dtype.kind == "f":
                cols.append(create_continuous_column(c))
            elif a.dtype.kind in "iu":
                cols.append(ColumnSchema(c, dtype="int64"))
            else:
                cols.append(ColumnSchema(c, dtype="bytes"))
        return Dataset(data, schema=Schema(cols))

    wf_train = workflow.fit_transform(to_ds(train_df))
    wf_valid = workflow.transform(to_ds(valid_df))

    genre_vocab = None

    def finalize(ds, df):
        nonlocal genre_vocab
        tbl = ds.to_table()
        data = {n: np.asarray(tbl[n]) for n in tbl.column_names}
        cols = []
        for c in ds.schema:
            if c.name == "movieId":
                cols.append(c.with_tags((Tags.ITEM, Tags.ITEM_ID)))
            elif c.name == "userId":
                cols.append(c.with_tags((Tags.USER, Tags.USER_ID)))
            elif c.name in ("age", "gender", "occupation", "zipcode"):
                cols.append(c.with_tags((Tags.USER,)))
            else:
                cols.append(c)
        out = dict(data)
        if genre_col is not None:
            ids, genre_vocab = _encode_genres_list(df[genre_col].tolist(), genre_vocab)
            ids = [row[:max_genres] for row in ids]
            out["genres"] = pa.array(ids, pa.list_(pa.int32()))
            cols.append(
                create_categorical_column(
                    "genres", genre_vocab_size or (max(genre_vocab.values()) if genre_vocab else 1),
                    tags=(Tags.ITEM,), is_list=True, max_seq_length=max_genres,
                )
            )
        table = pa.table({c.name: out[c.name] if c.name in out else data[c.name]
                          for c in cols})
        return Dataset(table, schema=Schema(cols))

    return finalize(wf_train, train_df), finalize(wf_valid, valid_df)


def _load_movielens_1m_full(path: str):
    """Full raw ml-1m preparation (``users.dat``/``movies.dat``/``ratings.dat``,
    ``::``-separated): joins demographics and genres, 80/20 shuffled split,
    then the reference-equivalent workflow (reference
    ``default_ml1m_transformation``, ``dataset.py:226-322``)."""
    import pandas as pd

    paths = {n: os.path.join(path, n) for n in ("users.dat", "movies.dat", "ratings.dat")}
    if not all(os.path.exists(p) for p in paths.values()):
        return None
    kw = dict(sep="::", engine="python", encoding="latin1")
    users = pd.read_csv(paths["users.dat"],
                        names=["userId", "gender", "age", "occupation", "zipcode"], **kw)
    movies = pd.read_csv(paths["movies.dat"], names=["movieId", "title", "genres"], **kw)
    ratings = pd.read_csv(paths["ratings.dat"],
                          names=["userId", "movieId", "rating", "timestamp"], **kw)
    joined = ratings.merge(users, on="userId", how="left").merge(
        movies[["movieId", "genres"]], on="movieId", how="left"
    )
    joined = joined.sample(frac=1.0, random_state=42).reset_index(drop=True)
    n_valid = int(len(joined) * 0.2)
    train_df, valid_df = joined[:-n_valid], joined[-n_valid:]
    return _movielens_join_and_transform(
        train_df, valid_df, movielens_1m_workflow(), genre_col="genres"
    )


def _load_movielens_25m_full(path: str):
    """Full raw ml-25m preparation (``movies.csv`` + ``ratings.csv``): genre
    join, 80/20 shuffled split, reference-equivalent workflow (reference
    ``default_ml25m_transformation``, ``dataset.py:159-222``)."""
    import pandas as pd

    movies_csv = os.path.join(path, "movies.csv")
    ratings_csv = os.path.join(path, "ratings.csv")
    if not (os.path.exists(movies_csv) and os.path.exists(ratings_csv)):
        return None
    movies = pd.read_csv(movies_csv)
    ratings = pd.read_csv(ratings_csv)
    joined = ratings.merge(movies[["movieId", "genres"]], on="movieId", how="left")
    joined = joined.sample(frac=1.0, random_state=42).reset_index(drop=True)
    n_valid = int(len(joined) * 0.2)
    train_df, valid_df = joined[:-n_valid], joined[-n_valid:]
    return _movielens_join_and_transform(
        train_df, valid_df, movielens_25m_workflow(), genre_col="genres"
    )


def _load_movielens_raw(path: str, variant: str):
    """Parse classic raw MovieLens files when present: 100k full layout
    (``u.*``/``ua.*`` — runs the reference-equivalent preprocessing workflow,
    :func:`movielens_100k_workflow`), ml-1m full layout
    (``users.dat``/``movies.dat``/``ratings.dat``), ml-25m full layout
    (``movies.csv`` + ``ratings.csv``); ratings-only fallbacks otherwise."""
    if variant in ("ml-100k", "movielens-100k"):
        full = _load_movielens_100k_full(path)
        if full is not None:
            return full
    if variant in ("ml-1m", "movielens-1m"):
        full = _load_movielens_1m_full(path)
        if full is not None:
            return full
    if variant in ("ml-25m", "movielens-25m"):
        full = _load_movielens_25m_full(path)
        if full is not None:
            return full
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
    ``merlin/datasets/ecommerce/booking``): per-trip city sequences. With
    ``path`` pointing at the raw challenge layout (``train_set.csv``) the
    reference-equivalent ETL runs locally (see :func:`_load_booking_raw`);
    with no ``path`` (no egress in this environment) a synthetic dataset with
    the real schema layout is generated."""
    if path is not None:
        raw = _load_booking_raw(path)
        if raw is not None:
            return raw
    return _from_path_or_synthetic(path, "booking", num_rows)


def _categorify_freq(values: "np.ndarray") -> Tuple["np.ndarray", int]:
    """Frequency-ordered integer encoding, id 0 reserved for OOV/NA — the
    NVTabular ``Categorify`` convention the rest of the stack assumes.
    Returns (codes, vocab_size_including_oov)."""
    import pandas as pd

    s = pd.Series(values)
    order = s.value_counts(dropna=True).index
    mapping = {v: i + 1 for i, v in enumerate(order)}
    codes = s.map(mapping).fillna(0).astype("int64").to_numpy()
    return codes, len(mapping) + 1


def _load_booking_raw(path: str, max_trip_len: int = 20):
    """Reference-equivalent local ETL for the raw Booking.com challenge file
    (``train_set.csv``: user_id, checkin, checkout, city_id, device_class,
    affiliate_id, booker_country, hotel_country, utrip_id). Mirrors
    ``ecommerce/booking/dataset.py:114-296`` (``preprocess_booking`` +
    ``default_booking_transformation``) without NVTabular:

    - derived per-booking features: month/weekday of checkin, weekday of
      checkout, is_weekend, season (month//3), stay length in days, cyclic
      dayofweek sin/cos;
    - frequency-ordered Categorify (0 = OOV) of every id/categorical column;
    - trips grouped by ``utrip_id`` sorted by checkout timestamp: list
      features for the sequence columns, ``first`` for trip-level ones;
    - 80/20 split BY TRIP (seed 42) — the challenge's test set has no
      held-out targets, so validation comes from train trips.
    """
    import pandas as pd
    import pyarrow as pa

    from ..schema import ColumnSchema, create_categorical_column, create_continuous_column

    train_csv = os.path.join(path, "train_set.csv")
    if not os.path.exists(train_csv):
        return None
    df = pd.read_csv(train_csv, parse_dates=["checkin", "checkout"])
    df = df.dropna(subset=["utrip_id", "city_id", "checkin", "checkout"])

    # --- derived features (reference default_booking_transformation) -------
    df["timestamp"] = df["checkout"].astype("int64")
    df["month"] = df["checkin"].dt.month.astype("int64")
    df["weekday_checkin"] = df["checkin"].dt.weekday.astype("int64")
    df["weekday_checkout"] = df["checkout"].dt.weekday.astype("int64")
    df["is_weekend"] = df["weekday_checkin"].isin([5, 6]).astype("int64")
    df["length"] = (df["checkout"] - df["checkin"]).dt.days.astype("float32")
    df["season"] = ((df["month"] - 1) // 3).astype("int64")
    scaled = (df["weekday_checkout"] + 1 + 1e-6) / 7.0
    df["dayofweek_sin"] = np.sin(2 * np.pi * scaled).astype("float32")
    df["dayofweek_cos"] = np.cos(2 * np.pi * scaled).astype("float32")

    # --- Categorify -------------------------------------------------------
    vocab: Dict[str, int] = {}
    for c in ("city_id", "booker_country", "hotel_country", "device_class",
              "affiliate_id", "user_id", "utrip_id"):
        df[c], vocab[c] = _categorify_freq(df[c].to_numpy())
    # small derived categoricals keep their natural ranges (+1 headroom)
    vocab.update(month=13, weekday_checkin=7, weekday_checkout=7,
                 is_weekend=2, season=4)

    # --- group into trips ---------------------------------------------------
    df = df.sort_values(["utrip_id", "timestamp"], kind="stable")
    g = df.groupby("utrip_id", sort=False)
    seq_cols = ["city_id", "booker_country", "hotel_country", "month",
                "weekday_checkin", "weekday_checkout", "is_weekend",
                "dayofweek_sin", "dayofweek_cos"]
    first_cols = ["user_id", "device_class", "affiliate_id", "length"]
    lists = {c: g[c].apply(lambda s: list(s)[:max_trip_len]) for c in seq_cols}
    firsts = {c: g[c].first() for c in first_cols}
    trips = pd.DataFrame({"utrip_id": lists["city_id"].index})
    n = len(trips)

    # --- 80/20 split by trip -------------------------------------------------
    rng = np.random.RandomState(42)
    perm = rng.permutation(n)
    n_valid = max(int(n * 0.2), 1)
    splits = {"train": perm[:-n_valid], "valid": perm[-n_valid:]}

    max_len = min(int(lists["city_id"].str.len().max()), max_trip_len)
    cols = [
        create_categorical_column("utrip_id", vocab["utrip_id"],
                                  tags=(Tags.SESSION_ID,)),
        create_categorical_column("user_id", vocab["user_id"],
                                  tags=(Tags.USER, Tags.USER_ID)),
        create_categorical_column("device_class", vocab["device_class"], tags=(Tags.USER,)),
        create_categorical_column("affiliate_id", vocab["affiliate_id"], tags=("context",)),
        create_continuous_column("length"),
        create_categorical_column("city_id", vocab["city_id"],
                                  tags=(Tags.ITEM, Tags.ITEM_ID, Tags.SEQUENCE),
                                  is_list=True, max_seq_length=max_len),
    ]
    for c in ("booker_country", "hotel_country", "month", "weekday_checkin",
              "weekday_checkout", "is_weekend"):
        cols.append(create_categorical_column(
            c, vocab[c], tags=(Tags.SEQUENCE,), is_list=True, max_seq_length=max_len
        ))
    for c in ("dayofweek_sin", "dayofweek_cos"):
        cols.append(create_continuous_column(
            c, tags=(Tags.SEQUENCE,), is_list=True, max_seq_length=max_len
        ))

    def build(idx):
        data = {
            "utrip_id": pa.array(np.asarray(trips["utrip_id"])[idx].astype("int32")),
            "user_id": pa.array(firsts["user_id"].to_numpy()[idx].astype("int32")),
            "device_class": pa.array(firsts["device_class"].to_numpy()[idx].astype("int32")),
            "affiliate_id": pa.array(firsts["affiliate_id"].to_numpy()[idx].astype("int32")),
            "length": pa.array(firsts["length"].to_numpy()[idx].astype("float32")),
        }
        for c in seq_cols:
            rows = lists[c].to_numpy()[idx]
            if c in ("dayofweek_sin", "dayofweek_cos"):
                data[c] = pa.array([list(map(float, r)) for r in rows],
                                   pa.list_(pa.float32()))
            else:
                data[c] = pa.array([list(map(int, r)) for r in rows],
                                   pa.list_(pa.int32()))
        table = pa.table({c.name: data[c.name] for c in cols})
        return Dataset(table, schema=Schema(cols))

    return build(splits["train"]), build(splits["valid"])


def get_dressipi2022(
    path: Optional[str] = None, num_rows: int = 50_000,
    category_coverage_min: float = 0.8,
) -> Tuple[Dataset, Dataset]:
    """Dressipi RecSys'22 challenge sessions (reference
    ``ecommerce/dressipi/dataset.py:53-127``). With ``path`` holding the raw
    release (``train_sessions.csv``, ``train_purchases.csv``,
    ``item_features.csv``) the reference's preparation runs natively:

    - item features filtered to the reference's kept category ids plus any
      category covering >= ``category_coverage_min`` of items, minus its
      dropped set, then pivoted to one ``f_<id>`` column per category
      (missing -> -1);
    - sessions/purchases joined with item features; ``date`` becomes
      ``timestamp`` (ms) and ``day``;
    - the last 30 days of sessions form the validation split; each split is
      joined with its sessions' purchases (renamed ``purchase_id``).

    Without ``path``, synthesizes from the stored ``dressipi2022-preprocessed``
    schema (the reference's own no-download escape hatch).
    """
    if path is not None and os.path.isdir(path) and os.path.exists(
        os.path.join(path, "train_sessions.csv")
    ):
        return _load_dressipi_raw(path, category_coverage_min)
    return _from_path_or_synthetic(path, "dressipi2022-preprocessed", num_rows)


def _load_dressipi_raw(path: str, category_coverage_min: float):
    import pandas as pd

    feats = pd.read_csv(os.path.join(path, "item_features.csv"))
    coverage = feats["feature_category_id"].value_counts() / feats["item_id"].nunique()
    keep = [3, 4, 5, 17, 24, 30, 45, 46, 53, 55, 58, 63, 65, 73]
    feats = feats[
        feats["feature_category_id"].isin(keep)
        | feats["feature_category_id"].isin(coverage[coverage >= category_coverage_min].index)
    ]
    feats = feats[~feats["feature_category_id"].isin([30, 4, 46, 28, 53, 1])]
    feats = feats.pivot(index="item_id", columns="feature_category_id").reset_index()
    feats.columns = ["item_id"] + feats.columns.get_level_values(1)[1:].tolist()
    fcols = [c for c in feats.columns if isinstance(c, (int, np.integer))]
    feats[fcols] = feats[fcols].fillna(-1).astype("int64")
    feats.columns = [
        "f_" + str(c) if isinstance(c, (int, np.integer)) else str(c) for c in feats.columns
    ]

    def prep(df):
        df = df.merge(feats, on="item_id", how="left")
        df["date"] = pd.to_datetime(df["date"])
        df["timestamp"] = df["date"].astype("int64") // 10**6  # ms
        df = df.sort_values(["session_id", "date"]).reset_index(drop=True)
        df["day"] = (df["date"] - df["date"].min()).dt.days
        return df

    sessions = prep(pd.read_csv(os.path.join(path, "train_sessions.csv")))
    purchases = prep(pd.read_csv(os.path.join(path, "train_purchases.csv")))
    purchases = purchases.rename(columns={"item_id": "purchase_id"})

    cut = sessions["day"].max() - 30
    splits = []
    for mask in (sessions["day"] <= cut, sessions["day"] > cut):
        part = sessions[mask].reset_index(drop=True)
        pur = purchases[purchases["session_id"].isin(part["session_id"].unique())]
        part = part.merge(pur[["session_id", "purchase_id"]], on="session_id", how="left")
        part = part.drop(columns=["date"]).fillna(-1)
        splits.append(part)

    from ..schema import ColumnSchema, create_categorical_column

    frame = pd.concat(splits)
    cols = []
    for name in splits[0].columns:
        card = int(frame[name].max())
        if name in ("timestamp",):
            cols.append(ColumnSchema(name, dtype="int64"))
        elif name == "purchase_id":
            cols.append(create_categorical_column(name, card, tags=(Tags.TARGET,)))
        elif name == "item_id":
            cols.append(create_categorical_column(name, card, tags=(Tags.ITEM_ID, Tags.ITEM)))
        elif name == "session_id":
            cols.append(create_categorical_column(name, card, tags=(Tags.SESSION, Tags.SESSION_ID)))
        else:
            cols.append(create_categorical_column(name, card, tags=(Tags.ITEM,)))
    schema = Schema(cols)

    def to_ds(df):
        data = {c: np.asarray(df[c]) for c in df.columns}
        return Dataset(data, schema=schema)

    return to_ds(splits[0]), to_ds(splits[1])


def get_sigir(
    path: Optional[str] = None, num_rows: int = 50_000, table: str = "browsing"
) -> Tuple[Dataset, Dataset]:
    """SIGIR'21 e-commerce data challenge (reference stores schemas under
    ``ecommerce/sigir/{browsing_train,sku_information}``; there is no
    downloader — the data requires registration). ``table``: "browsing" or
    "sku". With ``path`` holding prepared parquet, loads it; otherwise
    synthesizes from the stored schema."""
    name = {"browsing": "sigir-browsing", "sku": "sigir-sku"}.get(table)
    if name is None:
        raise ValueError(f"table must be 'browsing' or 'sku', got {table!r}")
    return _from_path_or_synthetic(path, name, num_rows)


def get_tenrec(
    path: Optional[str] = None, num_rows: int = 50_000, table: str = "QK-video"
) -> Tuple[Dataset, Dataset]:
    """Tenrec multi-task feedback dataset (reference stores the schema under
    ``merlin/datasets/social/schema.json`` + ``entertainment/tenrec_video``;
    like sigir, the reference ships NO downloader or ETL — the data requires
    registration). With ``path`` holding the published raw layout
    (``QK-video.csv``: user_id, item_id, click, follow, like, share,
    video_category, watching_times, gender, age) the reference-equivalent
    local ETL runs (:func:`_load_tenrec_raw`); with prepared parquet it loads
    directly; otherwise data is synthesized from the stored schema."""
    if path is not None:
        raw = _load_tenrec_raw(path, table)
        if raw is not None:
            return raw
    return _from_path_or_synthetic(path, "tenrec-video", num_rows)


def _load_tenrec_raw(path: str, table: str = "QK-video", seed: int = 42):
    """Local ETL for the raw Tenrec CSV: frequency-ordered Categorify of every
    id/categorical column (0 = OOV, the NVTabular convention), watching_times
    clipped to [0, 5] as the regression target, binary feedback columns kept
    as int32 targets, 80/20 random row split."""
    import pandas as pd

    from ..schema import ColumnSchema, Domain, create_categorical_column

    csv = os.path.join(path, f"{table}.csv")
    if not os.path.exists(csv):
        return None
    df = pd.read_csv(csv)
    needed = {"user_id", "item_id", "click"}
    if not needed.issubset(df.columns):
        raise ValueError(
            f"{csv} is missing required Tenrec columns {sorted(needed - set(df.columns))}"
        )

    vocab: Dict[str, int] = {}
    cat_cols = [c for c in ("user_id", "item_id", "video_category", "gender", "age")
                if c in df.columns]
    for c in cat_cols:
        df[c], vocab[c] = _categorify_freq(df[c].to_numpy())

    tag_map = {
        "user_id": (Tags.USER, Tags.USER_ID),
        "item_id": (Tags.ITEM, Tags.ITEM_ID),
        "video_category": (Tags.ITEM,),
        "gender": (Tags.USER,),
        "age": (Tags.USER,),
    }
    cols = [
        create_categorical_column(c, vocab[c], tags=tag_map[c]) for c in cat_cols
    ]
    target_cols = [c for c in ("click", "follow", "like", "share") if c in df.columns]
    for c in target_cols:
        cols.append(ColumnSchema(
            c, tags=(Tags.BINARY_CLASSIFICATION, Tags.TARGET), dtype="int32"
        ))
    has_watch = "watching_times" in df.columns
    if has_watch:
        df["watching_times"] = df["watching_times"].clip(0, 5)
        cols.append(ColumnSchema(
            "watching_times", tags=(Tags.REGRESSION, Tags.TARGET), dtype="int32",
            int_domain=Domain(0, 5, is_categorical=False),
        ))
    schema = Schema(cols)

    rng = np.random.RandomState(seed)
    perm = rng.permutation(len(df))
    n_valid = max(int(len(df) * 0.2), 1)

    def build(idx):
        data = {}
        for c in cat_cols:
            data[c] = df[c].to_numpy()[idx].astype("int32")
        for c in target_cols:
            data[c] = df[c].to_numpy()[idx].astype("int32")
        if has_watch:
            data["watching_times"] = df["watching_times"].to_numpy()[idx].astype("int32")
        return Dataset(data, schema=schema)

    return build(perm[:-n_valid]), build(perm[-n_valid:])


def get_ecommerce_transactions(
    path: Optional[str] = None, num_rows: int = 50_000
) -> Tuple[Dataset, Dataset]:
    """H&M-style purchase transactions (reference stores only
    ``ecommerce/transactions/schema.pbtxt``: customer_id, article_id, price,
    sales_channel_id — no downloader or ETL). With ``path`` holding the raw
    Kaggle layout (``transactions_train.csv``: t_dat, customer_id,
    article_id, price, sales_channel_id) the local ETL frequency-categorifies
    the ids, standardizes price, and splits the LAST 20%% of days into
    validation (temporal split — purchases are a time series); otherwise
    synthesizes from the stored schema."""
    if path is not None:
        raw = _load_transactions_raw(path)
        if raw is not None:
            return raw
    return _from_path_or_synthetic(path, "transactions", num_rows)


def _load_transactions_raw(path: str):
    import pandas as pd

    from ..schema import create_categorical_column, create_continuous_column

    csv = os.path.join(path, "transactions_train.csv")
    if not os.path.exists(csv):
        return None
    df = pd.read_csv(csv, parse_dates=["t_dat"])
    vocab: Dict[str, int] = {}
    for c in ("customer_id", "article_id", "sales_channel_id"):
        df[c], vocab[c] = _categorify_freq(df[c].to_numpy())
    price = df["price"].astype("float64")
    df["price"] = ((price - price.mean()) / max(price.std(), 1e-12)).astype("float32")

    cols = [
        create_categorical_column("customer_id", vocab["customer_id"],
                                  tags=(Tags.USER, Tags.USER_ID)),
        create_categorical_column("article_id", vocab["article_id"],
                                  tags=(Tags.ITEM, Tags.ITEM_ID)),
        create_categorical_column("sales_channel_id", vocab["sales_channel_id"],
                                  tags=("context",)),
        create_continuous_column("price"),
    ]
    schema = Schema(cols)

    df = df.sort_values("t_dat", kind="stable")
    cut = df["t_dat"].quantile(0.8)
    tr, va = df[df["t_dat"] <= cut], df[df["t_dat"] > cut]
    if len(va) == 0:
        tr, va = df.iloc[: int(len(df) * 0.8)], df.iloc[int(len(df) * 0.8):]

    def build(d):
        return Dataset(
            {
                "customer_id": d["customer_id"].to_numpy().astype("int32"),
                "article_id": d["article_id"].to_numpy().astype("int32"),
                "sales_channel_id": d["sales_channel_id"].to_numpy().astype("int32"),
                "price": d["price"].to_numpy().astype("float32"),
            },
            schema=schema,
        )

    return build(tr), build(va)
