"""Dynamic-vocabulary embeddings (VERDICT r5 #5 — the sok.DynamicVariable
analog, reference ``merlin/models/tf/distributed/embedding.py:16-233``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import models_tpu as mm
from models_tpu.core.types import SequenceFeature
from models_tpu.inputs.dynamic import EMPTY, DynamicEmbeddingTable, string_id_hash
from models_tpu.schema import Schema, Tags, create_categorical_column


def _table(capacity=64, dim=8, **kw):
    col = create_categorical_column("item", 100, tags=(Tags.ITEM_ID,))
    return DynamicEmbeddingTable(dim=dim, col_schema=col, capacity=capacity, **kw)


def test_allocation_and_consistency():
    t = _table()
    ids = jnp.asarray([5, 99999, 5, 123456, 7], jnp.int32)
    out = t(ids, training=True)
    assert out.shape == (5, 8)
    assert t.num_allocated == 4  # duplicates share a slot

    keys = t.hash_keys.value
    s1, _ = t._map_ids(ids, keys, training=False)
    s2, _ = t._map_ids(ids, keys, training=False)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert int(s1[0]) == int(s1[2])
    assert len({int(s1[j]) for j in (0, 1, 3, 4)}) == 4


def test_eval_never_allocates():
    t = _table()
    t(jnp.asarray([1, 2, 3], jnp.int32), training=True)
    before = t.num_allocated
    t(jnp.asarray([777777, 888888], jnp.int32), training=False)
    assert t.num_allocated == before


def test_overflow_falls_back_to_shared_slot():
    """Past capacity, unseen ids degrade to the shared mod-hash slot (no
    crash, no eviction) — the documented graceful-degradation policy."""
    t = _table(capacity=16)
    # saturate: far more distinct ids than capacity
    for lo in range(0, 400, 100):
        t(jnp.arange(lo, lo + 100, dtype=jnp.int32) * 7919 + 13, training=True)
    assert t.num_allocated <= t.capacity
    # further lookups still produce in-range slots
    s, _ = t._map_ids(jnp.asarray([123456789], jnp.int32), t.hash_keys.value, False)
    assert 0 <= int(s[0]) < t.capacity


def test_sequence_inputs_allocate():
    t = _table()
    sf = SequenceFeature(jnp.asarray([[1, 2], [3, 1]], jnp.int32), jnp.ones((2, 2), bool))
    out = t(sf, training=True)
    assert out.values.shape == (2, 2, 8)
    assert t.num_allocated == 3


def test_string_id_hash_deterministic_nonnegative():
    h1 = string_id_hash(np.array(["user_a", "user_b", "user_a"]))
    h2 = string_id_hash(np.array(["user_a", "user_b", "user_a"]))
    np.testing.assert_array_equal(h1, h2)
    assert h1[0] == h1[2] and h1[0] != h1[1]
    assert (h1 >= 0).all()


def _ranking_model_and_data(num_rows=256, vocab_seen=40):
    """Tiny binary-CTR model over ONE dynamic categorical feature with a
    planted signal: label = (raw_id is odd)."""
    rng = np.random.default_rng(3)
    ids = rng.integers(0, vocab_seen, num_rows).astype(np.int64) * 1009 + 7
    clicks = (ids % 2).astype(np.float32)
    schema = Schema([
        create_categorical_column("item", 1_000_000, tags=(Tags.ITEM_ID,)),
        create_categorical_column("click", 1, tags=(Tags.TARGET, Tags.BINARY_CLASSIFICATION)),
    ])
    ds = mm.Dataset({"item": ids, "click": clicks}, schema=schema)

    emb = mm.Embeddings(
        schema.categorical.excluding_by_tag(Tags.TARGET),
        dim=8,
        dynamic=True,
        dynamic_capacity={"item": 256},
    )
    body = mm.SequentialBlock([
        mm.InputBlockV2(schema, categorical=emb),
        mm.MLPBlock([16]),
    ])
    model = mm.Model(body, mm.BinaryOutput("click"))
    model.compile(optimizer="adam", learning_rate=0.05, metrics=[])
    return model, ds


def _find_dyn(model):
    from models_tpu.core.block import iter_blocks

    return next(b for b in iter_blocks(model) if isinstance(b, DynamicEmbeddingTable))


def test_compiled_fit_allocates_and_learns():
    """The hash map must ADVANCE inside the compiled train loop (functional
    state-update protocol), and training must separate the planted classes."""
    model, ds = _ranking_model_and_data()
    dyn = _find_dyn(model)
    assert dyn.num_allocated == 0 or dyn.num_allocated <= 32  # build-batch only
    hist = model.fit(ds, batch_size=64, epochs=8, verbose=0)
    assert dyn.num_allocated == 40  # every distinct raw id got a row
    losses = hist.history["loss"]
    assert losses[-1] < 0.55 * losses[0], losses


def test_unseen_ids_allocate_mid_training():
    """Incremental training: a second fit() on NEW raw ids allocates fresh
    rows and learns them (the sok.DynamicVariable streaming-ids use case)."""
    model, ds = _ranking_model_and_data()
    model.fit(ds, batch_size=64, epochs=3, verbose=0)
    dyn = _find_dyn(model)
    n0 = dyn.num_allocated
    assert n0 == 40

    rng = np.random.default_rng(9)
    new_ids = (rng.integers(100, 140, 256).astype(np.int64) * 1009 + 7)
    clicks = (new_ids % 2).astype(np.float32)
    ds2 = mm.Dataset({"item": new_ids, "click": clicks}, schema=ds.schema)
    hist2 = model.fit(ds2, batch_size=64, epochs=8, verbose=0)
    assert dyn.num_allocated > n0 + 30  # new ids own fresh rows
    assert hist2.history["loss"][-1] < 0.6 * hist2.history["loss"][0]


def test_save_load_keeps_hash_map(tmp_path):
    model, ds = _ranking_model_and_data()
    model.fit(ds, batch_size=64, epochs=2, verbose=0)
    dyn = _find_dyn(model)
    keys_before = np.asarray(dyn.hash_keys.value)
    p1 = model.predict(ds, batch_size=64)

    path = str(tmp_path / "dyn_model")
    model.save(path)
    loaded = mm.load_model(path)
    dyn2 = _find_dyn(loaded)
    np.testing.assert_array_equal(np.asarray(dyn2.hash_keys.value), keys_before)
    p2 = loaded.predict(ds, batch_size=64)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5, atol=1e-6)


def test_embeddings_factory_dynamic_flag():
    schema = Schema([
        create_categorical_column("a", 50),
        create_categorical_column("b", 50),
    ])
    block = mm.Embeddings(schema, dim=4, dynamic={"a": True})
    kinds = {name: type(t).__name__ for name, t in block.branches.items()}
    assert kinds["a"] == "DynamicEmbeddingTable"
    assert kinds["b"] == "EmbeddingTable"


def test_loader_auto_hashes_string_columns():
    """Raw-string id columns hash to deterministic int32 at the data plane
    (table_to_numpy) — the reference's safe_embedding_lookup_sparse use case;
    equal strings must map to equal ids across batches, loaders and runs."""
    users = np.array(["alice", "bob", "alice", "carol"] * 16)
    schema = Schema([
        create_categorical_column("user", 2**31 - 1, tags=(Tags.USER_ID,)),
        create_categorical_column("click", 1, tags=(Tags.TARGET, Tags.BINARY_CLASSIFICATION)),
    ])
    ds = mm.Dataset({"user": users, "click": np.ones(64, np.float32)}, schema=schema)
    x1, _ = mm.Loader(ds, batch_size=32, shuffle=False).peek()
    x2, _ = mm.Loader(ds, batch_size=64, shuffle=False).peek()
    assert x1["user"].dtype == np.int32
    assert x1["user"][0] == x1["user"][2] != x1["user"][1]
    np.testing.assert_array_equal(x1["user"], x2["user"][:32])
    np.testing.assert_array_equal(x1["user"], string_id_hash(users[:32]))
