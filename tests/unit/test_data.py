import os
import numpy as np
import pytest

from models_tpu.core.types import SequenceFeature
from models_tpu.data import Dataset, Loader, generate_data, sample_batch
from models_tpu.data.loader import ROW_VALID_KEY, pad_ragged
from models_tpu.schema import Tags


def test_generate_data_known_datasets():
    ds = generate_data("e-commerce", num_rows=64)
    assert ds.num_rows == 64
    assert "click" in ds.schema
    assert ds.schema["item_id"].cardinality == 1001


def test_generate_data_split():
    train, valid = generate_data("music-streaming", num_rows=100, set_sizes=(0.8, 0.2))
    assert train.num_rows == 80
    assert valid.num_rows == 20


def test_categorical_values_in_domain():
    ds = generate_data("testing", num_rows=200)
    cols = ds.to_numpy_dict()
    card = ds.schema["item_id"].cardinality
    assert cols["item_id"].max() < card
    assert cols["item_id"].min() >= 0


def test_parquet_roundtrip(tmp_path):
    ds = generate_data("music-streaming", num_rows=50)
    path = ds.to_parquet(str(tmp_path / "ms"))
    ds2 = Dataset.from_parquet(path)
    assert ds2.num_rows == 50
    assert ds2.schema["item_genres"].is_list
    assert set(ds2.schema["item_id"].tags) == set(ds.schema["item_id"].tags)


def test_pad_ragged():
    values = np.arange(7)
    offsets = np.array([0, 3, 3, 7])
    padded, mask = pad_ragged(values, offsets, 4)
    np.testing.assert_array_equal(padded, [[0, 1, 2, 0], [0, 0, 0, 0], [3, 4, 5, 6]])
    np.testing.assert_array_equal(mask.sum(axis=1), [3, 0, 4])


def test_loader_batches():
    ds = generate_data("music-streaming", num_rows=100)
    loader = Loader(ds, batch_size=32, shuffle=False, drop_last=False)
    batches = list(loader)
    assert len(batches) == 4
    feats, targets = batches[0]
    assert feats["item_id"].shape == (32,)
    assert isinstance(feats["item_genres"], SequenceFeature)
    assert feats["item_genres"].values.shape == (32, 4)
    assert isinstance(targets, dict)  # 3 targets in music-streaming
    assert set(targets) == {"click", "play_percentage", "like"}
    # final batch padded to full size with validity mask
    last_feats, _ = batches[-1]
    assert last_feats["item_id"].shape == (32,)
    assert last_feats[ROW_VALID_KEY].sum() == 100 - 3 * 32


def test_loader_drop_last():
    ds = generate_data("testing", num_rows=100)
    loader = Loader(ds, batch_size=32, drop_last=True)
    assert len(loader) == 3
    assert len(list(loader)) == 3


def test_loader_shuffle_changes_order_deterministically():
    ds = generate_data("testing", num_rows=64)
    l1 = Loader(ds, batch_size=64, shuffle=True, seed=7)
    l2 = Loader(ds, batch_size=64, shuffle=True, seed=7)
    f1, _ = next(iter(l1))
    f2, _ = next(iter(l2))
    np.testing.assert_array_equal(f1["item_id"], f2["item_id"])
    # second epoch differs from first
    f1b, _ = next(iter(l1))
    assert not np.array_equal(f1["item_id"], f1b["item_id"])


def test_loader_multihost_sharding():
    ds = generate_data("testing", num_rows=100)
    l0 = Loader(ds, batch_size=10, global_size=2, global_rank=0, drop_last=True)
    l1 = Loader(ds, batch_size=10, global_size=2, global_rank=1, drop_last=True)
    f0, _ = next(iter(l0))
    f1, _ = next(iter(l1))
    assert len(l0) == 5
    assert not np.array_equal(f0["user_id"], f1["user_id"])


def test_sample_batch():
    ds = generate_data("e-commerce", num_rows=64)
    feats, targets = sample_batch(ds, batch_size=16)
    assert feats["user_id"].shape == (16,)
    x_only = sample_batch(ds, batch_size=16, include_targets=False)
    assert "click" not in x_only


def test_unique_by():
    ds = generate_data("testing", num_rows=300)
    unique = ds.unique_by("item_id")
    ids = unique.to_numpy_dict()["item_id"]
    assert len(ids) == len(np.unique(ids))


def test_native_pad_ragged_matches_numpy():
    from models_tpu.data import native

    if native.load() is None:
        import pytest

        pytest.skip("no C++ compiler available")
    rng = np.random.default_rng(0)
    lens = rng.integers(0, 6, size=500)
    offsets = np.zeros(501, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    values = rng.standard_normal(int(offsets[-1])).astype(np.float32)
    out = native.pad_ragged(values, offsets, 6)
    assert out is not None
    padded, mask = out
    # numpy reference
    exp_p, exp_m = np.zeros((500, 6), np.float32), np.zeros((500, 6), bool)
    for i in range(500):
        n = min(lens[i], 6)
        exp_p[i, :n] = values[offsets[i] : offsets[i] + n]
        exp_m[i, :n] = True
    np.testing.assert_array_equal(padded, exp_p)
    np.testing.assert_array_equal(mask, exp_m)


def test_streaming_multifile_loader(tmp_path):
    """Multi-file datasets stream one partition at a time with full batches and
    cross-partition carry (the big-data path; single-file path materializes)."""
    ds = generate_data("music-streaming", num_rows=230)
    path = ds.to_parquet(str(tmp_path / "parts"), num_partitions=4)
    streamed = Dataset.from_parquet(path)
    assert streamed._files is not None and len(streamed._files) == 4

    loader = Loader(streamed, batch_size=32, shuffle=False, drop_last=False)
    batches = list(loader)
    # 230 rows -> 7 full batches + padded tail
    assert len(batches) == 8
    total_valid = sum(int(b[0][ROW_VALID_KEY].sum()) for b in batches)
    assert total_valid == 230
    ids = np.concatenate(
        [np.asarray(b[0]["item_id"])[np.asarray(b[0][ROW_VALID_KEY])] for b in batches]
    )
    # all rows covered exactly once
    ref_ids = ds.to_numpy_dict()["item_id"]
    np.testing.assert_array_equal(np.sort(ids), np.sort(ref_ids))
    # list columns survive partition boundaries
    assert all(isinstance(b[0]["item_genres"], SequenceFeature) for b in batches)


def test_streaming_loader_shuffled_epochs_differ(tmp_path):
    ds = generate_data("testing", num_rows=200)
    path = ds.to_parquet(str(tmp_path / "p"), num_partitions=3)
    loader = Loader(Dataset.from_parquet(path), batch_size=50, shuffle=True, seed=3)
    e1 = np.concatenate([np.asarray(b[0]["item_id"]) for b in loader])
    e2 = np.concatenate([np.asarray(b[0]["item_id"]) for b in loader])
    assert not np.array_equal(e1, e2)
    np.testing.assert_array_equal(np.sort(e1), np.sort(e2))


def test_get_booking_session_schema():
    """get_booking must return the booking session layout (city sequences), not
    a relabeled e-commerce CTR schema."""
    from models_tpu.data.datasets import get_booking
    from models_tpu.schema import Tags

    train, valid = get_booking(num_rows=128)
    assert "city_id" in train.schema
    city = train.schema["city_id"]
    assert city.is_list and city.has_tag(Tags.ITEM_ID) and city.has_tag(Tags.SEQUENCE)
    assert "utrip_id" in train.schema


def test_streaming_single_file_row_groups(tmp_path):
    """A SINGLE parquet file written with many row groups streams one group at
    a time (never materializing the whole file), with cross-chunk carry."""
    ds = generate_data("music-streaming", num_rows=230)
    path = ds.to_parquet(str(tmp_path / "one"), row_group_size=48, num_partitions=1)
    streamed = Dataset.from_parquet(path)
    assert streamed._files is not None and len(streamed._files) == 1

    loader = Loader(streamed, batch_size=32, shuffle=False, drop_last=False)
    assert len(loader._chunk_list()) == 5  # ceil(230/48)
    batches = list(loader)
    total_valid = sum(int(b[0][ROW_VALID_KEY].sum()) for b in batches)
    assert total_valid == 230
    ids = np.concatenate(
        [np.asarray(b[0]["item_id"])[np.asarray(b[0][ROW_VALID_KEY])] for b in batches]
    )
    ref_ids = ds.to_numpy_dict()["item_id"]
    np.testing.assert_array_equal(np.sort(ids), np.sort(ref_ids))
    assert all(isinstance(b[0]["item_genres"], SequenceFeature) for b in batches)

    # the whole-file column cache must stay empty (nothing materialized it)
    assert loader._col_cache is None

    # shuffled epochs differ but cover the same rows
    sloader = Loader(streamed, batch_size=32, shuffle=True, seed=7, drop_last=False)

    def epoch_ids(loader):
        return np.concatenate(
            [np.asarray(b[0]["item_id"])[np.asarray(b[0][ROW_VALID_KEY])] for b in loader]
        )

    e1 = epoch_ids(sloader)
    e2 = epoch_ids(sloader)
    assert not np.array_equal(e1, e2)
    np.testing.assert_array_equal(np.sort(e1), np.sort(e2))


def test_loader_transform_hook():
    """Loader(transform=) rewrites every batch (the reference's map)."""
    ds = generate_data("e-commerce", num_rows=96)

    def double_age(feats, targets):
        feats = dict(feats)
        feats["user_age"] = feats["user_age"] * 2.0
        return feats, targets

    plain = Loader(ds, batch_size=32, shuffle=False)
    mapped = Loader(ds, batch_size=32, shuffle=False, transform=double_age)
    (f1, _), (f2, _) = next(iter(plain)), next(iter(mapped))
    np.testing.assert_allclose(np.asarray(f2["user_age"]), 2.0 * np.asarray(f1["user_age"]))


def test_loader_multi_target_dict():
    ds = generate_data("e-commerce", num_rows=64)  # click + conversion targets
    loader = Loader(ds, batch_size=32, shuffle=False)
    _, targets = next(iter(loader))
    assert isinstance(targets, dict)
    assert set(targets) == {"click", "conversion"}


def test_loader_len_and_epochs():
    ds = generate_data("testing", num_rows=100)
    assert len(Loader(ds, batch_size=32, shuffle=False, drop_last=True)) == 3
    assert len(Loader(ds, batch_size=32, shuffle=False, drop_last=False)) == 4
    assert len(Loader(ds, batch_size=32, shuffle=False, drop_last=False,
                      global_size=2, global_rank=0)) == 2


def test_loader_fixed_length_lists_pad_to_schema():
    """valueCount min==N fixed-length lists must pad to N (NVTabular contract)."""
    from models_tpu.schema import ColumnSchema, Schema, Tags

    col = ColumnSchema("emb", tags=(Tags.CONTINUOUS,), is_list=True, value_count=(4, 4),
                       dtype="float32")
    schema = Schema([col])
    values = np.arange(8, dtype=np.float32)
    offsets = np.array([0, 4, 8], dtype=np.int64)
    ds = Dataset({"emb__values": values, "emb__offsets": offsets}, schema=schema)
    loader = Loader(ds, batch_size=2, shuffle=False)
    feats, _ = next(iter(loader))
    assert feats["emb"].values.shape == (2, 4)


def test_criteo_raw_parser(tmp_path):
    """Parse the classic day_* TSV format: label + 13 ints + 26 hex cats."""
    import gzip

    rng = np.random.default_rng(0)
    lines = []
    for i in range(50):
        label = str(rng.integers(0, 2))
        ints = [str(rng.integers(0, 100)) if rng.random() > 0.2 else "" for _ in range(13)]
        cats = [format(rng.integers(0, 2**32), "x") if rng.random() > 0.1 else "" for _ in range(26)]
        lines.append("\t".join([label] + ints + cats))
    (tmp_path / "day_0").write_text("\n".join(lines[:30]) + "\n")
    with gzip.open(tmp_path / "day_1.gz", "wt") as f:
        f.write("\n".join(lines[30:]) + "\n")

    from models_tpu.data.datasets import get_criteo

    train, valid = get_criteo(str(tmp_path), num_buckets=1000)
    assert train.num_rows + valid.num_rows == 50
    s = train.schema
    assert s["label"].is_target
    assert s["I1"].has_tag(Tags.CONTINUOUS) and s["C26"].has_tag(Tags.CATEGORICAL)
    cols = train.to_numpy_dict()
    assert cols["C1"].max() < 1000  # hashed into buckets
    assert np.isfinite(cols["I3"]).all()  # missing ints -> 0

    # trains end to end
    from models_tpu.models import DLRMModel

    m = DLRMModel(s, embedding_dim=8, bottom_block=(8,), top_block=(8,))
    m.compile()
    hist = m.fit(train, epochs=1, batch_size=16, verbose=0)
    assert np.isfinite(hist.history["loss"][0])


def test_aliccp_raw_parser(tmp_path):
    """Parse the Ali-CCP release layout: common_features + sample_skeleton csv
    with \\x01-separated field:feat:value triplets (reference format)."""
    sep = "\x01"
    for data_type, n in (("train", 24), ("test", 12)):
        d = tmp_path / data_type
        d.mkdir()
        # two common-feature blocks carrying user fields
        common_lines = []
        for ci in range(2):
            kv = sep.join([f"101:{ci + 1}:1", f"125:{ci + 2}:1", f"129:{ci + 5}:1"])
            common_lines.append(f"c{ci},3,{kv}")
        (d / f"common_features_{data_type}.csv").write_text("\n".join(common_lines) + "\n")
        rows = []
        rng = np.random.default_rng(1)
        for i in range(n):
            click = int(rng.integers(0, 2))
            conv = int(rng.integers(0, 2)) if click else 0
            kv = sep.join([
                f"205:{int(rng.integers(1, 50))}:1",
                f"206:{int(rng.integers(1, 10))}:1",
                f"301:{int(rng.integers(1, 4))}:1",
            ])
            rows.append(f"s{i},{click},{conv},c{i % 2},3,{kv}")
        # a malformed click=0/conversion=1 row the reference drops
        rows.append(f"sbad,0,1,c0,3,205:3:1")
        (d / f"sample_skeleton_{data_type}.csv").write_text("\n".join(rows) + "\n")

    from models_tpu.data.datasets import get_aliccp

    train, valid = get_aliccp(str(tmp_path))
    assert train.num_rows == 24 and valid.num_rows == 12  # bad row dropped
    s = train.schema
    assert s["item_id"].has_tag(Tags.ITEM_ID) and s["user_id"].has_tag(Tags.USER_ID)
    cols = train.to_numpy_dict()
    assert set(np.unique(cols["user_id"])) <= {1, 2}
    assert {"click", "conversion"} <= set(cols)
    # common features joined through the index
    assert (cols["user_age"] > 0).all()


REFERENCE_DATASETS = "/root/reference/merlin/datasets"
# our fixture name -> the reference's stored schema dir (synthetic.py KNOWN_DATASETS)
_REF_SCHEMA_DIRS = {
    "e-commerce": "ecommerce/small",
    "music-streaming": "entertainment/music_streaming",
    "social": "social",
    "testing": "testing",
    "sequence-testing": "testing/sequence_testing",
    "movielens-25m": "entertainment/movielens/25m",
    "movielens-100k": "entertainment/movielens/100k",
    "movielens-1m": "entertainment/movielens/1m",
    "tenrec-video": "entertainment/tenrec_video",
    "e-commerce-large": "ecommerce/large",
    "transactions": "ecommerce/transactions",
}


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DATASETS), reason="reference absent")
@pytest.mark.parametrize("name", sorted(_REF_SCHEMA_DIRS))
def test_synthetic_schema_matches_reference_fixture(name):
    """Our synthetic fixture schemas ARE the reference's stored schemas: same
    column names, list-ness, tags (item/user ids), and int-domain
    cardinalities — the interop contract that makes the reference's test
    strategy port 1:1 (SURVEY §4)."""
    from models_tpu.data.synthetic import known_schema
    from models_tpu.schema import Schema, Tags

    ref_dir = os.path.join(REFERENCE_DATASETS, _REF_SCHEMA_DIRS[name])
    json_path = os.path.join(ref_dir, "schema.json")
    pbtxt_path = os.path.join(ref_dir, "schema.pbtxt")
    if os.path.exists(json_path):
        ref = Schema.load(json_path)
    elif os.path.exists(pbtxt_path):
        ref = Schema.load_pbtxt(pbtxt_path)
    else:
        pytest.skip(f"no stored schema under {ref_dir}")
    ours = known_schema(name)

    assert set(ours.column_names) == set(ref.column_names), name
    for col in ref:
        mine = ours[col.name]
        assert mine.is_list == col.is_list, (name, col.name)
        if col.cardinality:
            assert mine.cardinality == col.cardinality, (name, col.name)
        for tag in (Tags.ITEM_ID, Tags.USER_ID, Tags.TARGET):
            assert mine.has_tag(tag) == col.has_tag(tag), (name, col.name, tag)


def test_loader_bucket_padding():
    """pad='bucket': list columns pad to the batch's longest row rounded up to
    a power-of-two bucket instead of the schema max — the TPU answer to
    long-tailed session lengths (compute scales with actual content)."""
    from models_tpu.schema import Schema, Tags, create_categorical_column

    col = create_categorical_column(
        "s", 50, tags=(Tags.ITEM_ID, Tags.SEQUENCE), is_list=True, max_seq_length=64
    )
    rng = np.random.default_rng(0)
    lengths = np.r_[rng.integers(1, 6, 31), 6]  # longest row = 6 -> bucket 8
    offsets = np.zeros(33, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    values = rng.integers(1, 50, int(offsets[-1]))
    ds = Dataset({"s__values": values, "s__offsets": offsets}, schema=Schema([col]))

    feats, _ = next(iter(Loader(ds, batch_size=32, shuffle=False, pad="bucket")))
    assert feats["s"].values.shape == (32, 8)  # bucket, not schema max 64
    fmax, _ = next(iter(Loader(ds, batch_size=32, shuffle=False)))
    assert fmax["s"].values.shape == (32, 64)  # default: schema max
    # same content where both exist
    np.testing.assert_array_equal(
        np.asarray(feats["s"].values), np.asarray(fmax["s"].values[:, :8])
    )
    np.testing.assert_array_equal(
        np.asarray(feats["s"].mask), np.asarray(fmax["s"].mask[:, :8])
    )


def test_bucket_padding_trains_session_model():
    from models_tpu.models.session import SessionBasedTransformerModel
    from models_tpu.transformer.block import GPT2Block
    from models_tpu.transforms.sequence import SequencePredictNext

    ds = generate_data("sequence-testing", num_rows=64)
    loader = Loader(ds, batch_size=16, shuffle=False, pad="bucket")
    m = SessionBasedTransformerModel(
        ds.schema, transformer=GPT2Block(d_model=16, n_head=2, n_layer=1), embedding_dim=8
    )
    m.compile()
    h = m.fit(loader, epochs=1, pre=SequencePredictNext(ds.schema, target="item_id_seq"),
              verbose=0)
    assert np.isfinite(h.history["loss"][0])


def test_dataset_utility_methods():
    ds = generate_data("testing", num_rows=100)
    assert ds.head(5).num_rows == 5
    assert ds.take(10).num_rows == 10
    cols = ds.select_columns(["user_id", "item_id"])
    assert set(cols.column_names) == {"user_id", "item_id"}
    assert len(cols.schema) == 2
    sh = ds.shuffle(seed=3)
    assert sh.num_rows == 100
    a = ds.to_numpy_dict()["item_id"]
    b = sh.to_numpy_dict()["item_id"]
    assert not np.array_equal(a, b)
    np.testing.assert_array_equal(np.sort(a), np.sort(b))
    r = repr(ds)
    assert "rows=100" in r


def test_movielens_1m_ratings_dat_parser(tmp_path):
    """ml-1m raw format: UserID::MovieID::Rating::Timestamp."""
    from models_tpu.data.datasets import get_movielens

    rng = np.random.default_rng(0)
    lines = [
        f"{rng.integers(1, 30)}::{rng.integers(1, 60)}::{rng.integers(1, 6)}::97830{i}"
        for i in range(120)
    ]
    (tmp_path / "ratings.dat").write_text("\n".join(lines) + "\n")
    train, valid = get_movielens(path=str(tmp_path), variant="ml-1m")
    assert train.num_rows + valid.num_rows == 120
    cols = train.to_numpy_dict()
    assert set(cols) >= {"userId", "movieId", "rating", "rating_binary"}
    assert cols["rating"].max() <= 5.0


# ---------------------------------------------------------------------------
# preprocessing workflows (reference NVTabular-equivalent ETL, VERDICT r2 #8)
# ---------------------------------------------------------------------------

def test_workflow_categorify_target_encoding_count():
    from models_tpu.data import Dataset
    from models_tpu.data.workflow import (
        Bucketize, Categorify, GroupbyCount, LambdaOp, TargetEncoding, Workflow,
    )
    from models_tpu.schema import ColumnSchema, Schema, Tags, create_continuous_column

    rng = np.random.default_rng(0)
    n = 400
    raw_items = rng.choice([11, 22, 33, 44, 55], size=n, p=[0.4, 0.3, 0.15, 0.1, 0.05])
    raw_users = rng.integers(100, 120, size=n)
    rating = rng.integers(1, 6, size=n).astype(np.float64)
    age = rng.integers(10, 80, size=n).astype(np.float32)
    ds = Dataset(
        {"movieId": raw_items, "userId": raw_users, "rating": rating, "age": age},
        schema=Schema([
            ColumnSchema("movieId", dtype="int64"),
            ColumnSchema("userId", dtype="int64"),
            create_continuous_column("rating"),
            create_continuous_column("age"),
        ]),
    )
    wf = Workflow([
        Categorify(["movieId", "userId"]),
        TargetEncoding("movieId", target="rating", kfold=3, p_smooth=20.0,
                       out="TE", normalize=True),
        GroupbyCount("userId", log=True, out="userId_count"),
        Bucketize({"age": [0, 20, 40, 60, 80]}, tags=Tags.USER),
        LambdaOp("rating", lambda v: (v > 3).astype("int32"), out="rating_binary",
                 tags=(Tags.BINARY_CLASSIFICATION, Tags.TARGET), dtype="int32"),
    ])
    out = wf.fit_transform(ds)
    t = out.to_table()
    ids = np.asarray(t["movieId"])
    # frequency-ordered ids: most frequent raw value (11) -> id 1
    assert ids[np.asarray(raw_items) == 11].min() == ids.max() or (ids[np.asarray(raw_items) == 11] == 1).all()
    assert out.schema.get("movieId").cardinality == 6  # 5 values + OOV slot
    te = np.asarray(t["TE"])
    assert abs(float(te.mean())) < 1e-6 and abs(float(te.std()) - 1.0) < 1e-5
    counts = np.asarray(t["userId_count"])
    u0 = raw_users[0]
    assert np.isclose(counts[0], np.log1p((raw_users == u0).sum()))
    assert out.schema.get("age").cardinality == 6
    assert set(np.asarray(t["rating_binary"])) <= {0, 1}

    # transform of a NEW split reuses fitted vocab/stats; unseen values -> OOV 0
    ds2 = Dataset(
        {"movieId": np.array([11, 99]), "userId": np.array([100, 999]),
         "rating": np.array([5.0, 1.0]), "age": np.array([25.0, 65.0], np.float32)},
        schema=ds.schema,
    )
    out2 = wf.transform(ds2)
    t2 = out2.to_table()
    assert np.asarray(t2["movieId"])[1] == 0  # unseen item -> OOV
    assert np.asarray(t2["userId_count"])[1] == 0.0  # log1p(0)


def test_new_dataset_accessors_synthesize():
    from models_tpu.data import get_dressipi2022, get_sigir

    train, valid = get_dressipi2022(num_rows=64)
    assert "purchase_id" in train.to_table().column_names
    assert train.schema.get("item_id").cardinality == 23146
    t_b, _ = get_sigir(table="browsing", num_rows=32)
    assert "session_id_hash" in t_b.to_table().column_names
    t_s, _ = get_sigir(table="sku", num_rows=32)
    assert t_s.schema.get("description_vector").is_list


def test_target_encoding_same_size_split_uses_mapping_not_oof():
    """Regression: a *different* split that happens to have the same row
    count as the fitted data must get mapping-based encodings, not the
    train set's out-of-fold values verbatim (silent target leakage)."""
    from models_tpu.data.workflow import TargetEncoding
    from models_tpu.schema import ColumnSchema, Schema, create_continuous_column

    rng = np.random.default_rng(7)
    n = 200
    col = rng.integers(0, 5, size=n)
    y = rng.random(n)
    schema = Schema([
        ColumnSchema("c", dtype="int64"), create_continuous_column("y"),
    ])
    op = TargetEncoding("c", target="y", kfold=4, p_smooth=5.0, out="TE",
                        normalize=False)
    op.fit({"c": col, "y": y}, schema)

    # different content, SAME row count -> must use the fitted mapping
    col2 = rng.integers(0, 5, size=n)
    data2, _ = op.transform({"c": col2, "y": y}, schema)
    expected = np.array([op.mapping[v] for v in col2.tolist()], np.float32)
    np.testing.assert_allclose(data2["TE"], expected, rtol=1e-6)

    # the fitted rows themselves still get the OOF encodings (which differ
    # from the full-data mapping because each fold excludes its own rows)
    data1, _ = op.transform({"c": col, "y": y}, schema)
    full = np.array([op.mapping[v] for v in col.tolist()], np.float32)
    assert not np.allclose(data1["TE"], full)


def test_target_encoding_fit_then_transform_train_is_oof_and_repeatable():
    """Regression (review): Workflow.fit() internally transforms the train
    split (feeding downstream ops), so the user's later transform(train) must
    STILL return the out-of-fold encodings — and return the same values every
    time (the old one-shot consumption leaked in-sample encodings)."""
    from models_tpu.data.workflow import TargetEncoding
    from models_tpu.schema import ColumnSchema, Schema, create_continuous_column

    rng = np.random.default_rng(3)
    n = 150
    col = rng.integers(0, 6, size=n)
    y = rng.random(n)
    schema = Schema([
        ColumnSchema("c", dtype="int64"), create_continuous_column("y"),
    ])
    op = TargetEncoding("c", target="y", kfold=3, p_smooth=4.0, out="TE",
                        normalize=False)
    op.fit({"c": col, "y": y}, schema)
    d1, _ = op.transform({"c": col, "y": y}, schema)  # e.g. inside wf.fit()
    d2, _ = op.transform({"c": col, "y": y}, schema)  # user's transform(train)
    np.testing.assert_allclose(d1["TE"], d2["TE"])
    full = np.array([op.mapping[v] for v in col.tolist()], np.float32)
    assert not np.allclose(d2["TE"], full)  # still OOF, not leaked mapping


def test_bucketed_dense_columns_groups_and_parity():
    """pad='bucket' device-resident grouping (VERDICT r3 #4): one scalar
    bucket per row (pow2 of the longest capped list), groups partition the
    rows, each group's lists pad to min(cap, bucket), and every original
    (scalar, sequence) row survives exactly once."""
    import pyarrow as pa

    from models_tpu.data import Dataset, Loader
    from models_tpu.schema import Schema, Tags, create_categorical_column

    rng = np.random.default_rng(0)
    n = 300
    lengths = rng.choice([3, 10, 50], size=n, p=[0.4, 0.4, 0.2])
    vals = [rng.integers(1, 100, size=l).astype(np.int32).tolist() for l in lengths]
    user = rng.integers(0, 20, n).astype(np.int32)
    schema = Schema([
        create_categorical_column("user_id", 19, tags=(Tags.USER, Tags.USER_ID)),
        create_categorical_column(
            "item_id_seq", 100, tags=(Tags.ITEM, Tags.ITEM_ID, Tags.SEQUENCE),
            is_list=True, max_seq_length=64,
        ),
    ])
    tbl = pa.table({"user_id": user, "item_id_seq": pa.array(vals, pa.list_(pa.int32()))})
    loader = Loader(Dataset(tbl, schema=schema), batch_size=32, pad="bucket", drop_last=True)
    groups = loader.bucketed_dense_columns()
    assert [g[0] for g in groups] == [4, 16, 64]
    assert sum(g[3] for g in groups) == n
    got = []
    for key, feats, t, ng in groups:
        sf = feats["item_id_seq"]
        assert sf.values.shape == (ng, min(64, key))
        for i in range(ng):
            L = int(np.asarray(sf.mask[i]).sum())
            got.append((int(feats["user_id"][i]),
                        tuple(np.asarray(sf.values[i][:L]).tolist())))
    want = [(int(user[i]), tuple(v[:64])) for i, v in enumerate(vals)]
    assert sorted(got) == sorted(want)


def test_bucketed_dense_columns_requires_lists():
    from models_tpu.data import Dataset, Loader
    from models_tpu.schema import Schema, Tags, create_categorical_column

    schema = Schema([create_categorical_column("a", 5, tags=(Tags.USER,))])
    ds = Dataset({"a": np.arange(8, dtype=np.int32) % 5}, schema=schema)
    with pytest.raises(ValueError, match="list features"):
        Loader(ds, batch_size=4, pad="max").bucketed_dense_columns()


def test_booking_raw_etl(tmp_path):
    """Raw Booking.com train_set.csv -> reference-equivalent trip ETL
    (reference ecommerce/booking/dataset.py:114-296): derived calendar
    features, frequency Categorify, trips grouped into list features sorted
    by checkout, split by trip."""
    import pandas as pd

    from models_tpu.data.datasets import get_booking
    from models_tpu.schema import Tags

    rng = np.random.default_rng(0)
    rows = []
    base = pd.Timestamp("2016-01-01")
    for t in range(40):
        L = int(rng.integers(2, 7))
        user = int(rng.integers(1, 12))
        start = base + pd.Timedelta(days=int(rng.integers(0, 200)))
        for i in range(L):
            ci = start + pd.Timedelta(days=3 * i)
            co = ci + pd.Timedelta(days=int(rng.integers(1, 4)))
            rows.append(dict(
                user_id=user, checkin=ci.date(), checkout=co.date(),
                city_id=int(rng.integers(1, 50)),
                device_class=["desktop", "mobile"][int(rng.integers(2))],
                affiliate_id=int(rng.integers(0, 9)),
                booker_country=["A", "B", "C"][int(rng.integers(3))],
                hotel_country=["X", "Y"][int(rng.integers(2))],
                utrip_id=f"{user}_{t}",
            ))
    pd.DataFrame(rows).to_csv(tmp_path / "train_set.csv", index=False)

    train, valid = get_booking(path=str(tmp_path))
    assert train.num_rows + valid.num_rows == 40  # one row per trip
    sch = train.schema
    item = sch.select_by_tag(Tags.ITEM_ID).first
    assert item.name == "city_id" and item.is_list
    assert sch["utrip_id"].has_tag(Tags.SESSION_ID)
    assert sch["user_id"].has_tag(Tags.USER_ID)
    for c in ("booker_country", "hotel_country", "month", "is_weekend",
              "weekday_checkin", "weekday_checkout"):
        assert sch[c].is_list and sch[c].has_tag(Tags.SEQUENCE), c
    # cyclic features are float lists
    assert sch["dayofweek_sin"].is_list and sch["dayofweek_sin"].dtype == "float32"
    cols = train.to_numpy_dict()
    # Categorify convention: 0 reserved for OOV, codes within declared domain
    cities = cols["city_id__values"]
    assert cities.min() >= 1
    assert cities.max() <= item.cardinality
    # every sequence feature rides the same per-trip offsets as city_id
    np.testing.assert_array_equal(cols["city_id__offsets"], cols["month__offsets"])
    np.testing.assert_array_equal(
        cols["city_id__offsets"], cols["dayofweek_sin__offsets"]
    )


def test_tenrec_raw_etl(tmp_path):
    """get_tenrec(path=) runs the local ETL on the published QK-video.csv
    layout (VERDICT r5 #8): frequency Categorify (0=OOV), clipped
    watching_times regression target, 80/20 split, schema tags in place."""
    import pandas as pd

    from models_tpu.data import get_tenrec
    from models_tpu.schema import Tags

    rng = np.random.default_rng(4)
    n = 200
    df = pd.DataFrame({
        "user_id": rng.integers(1000, 1040, n),
        "item_id": rng.integers(5000, 5100, n),
        "click": rng.integers(0, 2, n),
        "follow": rng.integers(0, 2, n),
        "like": rng.integers(0, 2, n),
        "share": rng.integers(0, 2, n),
        "video_category": rng.integers(0, 4, n),
        "watching_times": rng.integers(0, 12, n),
        "gender": rng.integers(0, 3, n),
        "age": rng.integers(0, 8, n),
    })
    df.to_csv(tmp_path / "QK-video.csv", index=False)

    train, valid = get_tenrec(str(tmp_path))
    assert train.num_rows + valid.num_rows == n
    s = train.schema
    assert s["user_id"].has_tag(Tags.USER_ID)
    assert s["item_id"].has_tag(Tags.ITEM_ID)
    for t in ("click", "follow", "like", "share", "watching_times"):
        assert s[t].has_tag(Tags.TARGET), t
    cols = train.to_numpy_dict()
    # frequency Categorify: codes are dense, 0 reserved for OOV
    assert cols["user_id"].min() >= 1
    assert cols["user_id"].max() < s["user_id"].cardinality
    assert cols["watching_times"].max() <= 5  # clipped regression target
    # the fixture fallback still works without a path
    synth_train, synth_valid = get_tenrec(None, num_rows=64)
    assert set(synth_train.schema.column_names) >= {"user_id", "item_id", "click"}


def test_transactions_raw_etl(tmp_path):
    """get_ecommerce_transactions(path=) parses the Kaggle H&M layout with a
    TEMPORAL 80/20 split and standardized price; schema matches the
    reference's stored transactions schema shape."""
    import pandas as pd

    from models_tpu.data import get_ecommerce_transactions
    from models_tpu.schema import Tags

    rng = np.random.default_rng(5)
    n = 300
    df = pd.DataFrame({
        "t_dat": pd.to_datetime("2020-01-01") + pd.to_timedelta(rng.integers(0, 100, n), unit="D"),
        "customer_id": [f"c{int(i):03d}" for i in rng.integers(0, 50, n)],
        "article_id": rng.integers(100000, 100200, n),
        "price": rng.uniform(0.01, 0.5, n),
        "sales_channel_id": rng.integers(1, 3, n),
    })
    df.to_csv(tmp_path / "transactions_train.csv", index=False)

    train, valid = get_ecommerce_transactions(str(tmp_path))
    assert train.num_rows + valid.num_rows == n
    s = train.schema
    assert s["customer_id"].has_tag(Tags.USER_ID)
    assert s["article_id"].has_tag(Tags.ITEM_ID)
    tr = train.to_numpy_dict()
    va = valid.to_numpy_dict()
    assert abs(float(np.concatenate([tr["price"], va["price"]]).mean())) < 1e-3
    # temporal split: every valid row is later than (or equal to) train's cut
    assert train.num_rows >= valid.num_rows
    synth_train, _ = get_ecommerce_transactions(None, num_rows=64)
    assert set(synth_train.schema.column_names) == {
        "customer_id", "article_id", "sales_channel_id", "price"
    }
