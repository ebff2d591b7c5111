import jax.numpy as jnp
import numpy as np
import optax
import pytest

from models_tpu.blocks.optimizer import (
    LazyAdam,
    MultiOptimizer,
    SparseEmbeddingOptimizer,
    split_embeddings_on_size,
)
from models_tpu.data import Dataset, generate_data
from models_tpu.inputs.embedding import EmbeddingTable
from models_tpu.models import MatrixFactorizationModel, TwoTowerModel
from models_tpu.schema import Schema, Tags, create_categorical_column


def identity_dataset(n_users=50, rows=400):
    rng = np.random.default_rng(0)
    users = rng.integers(0, n_users, size=rows).astype(np.int32)
    schema = Schema(
        [
            create_categorical_column("user_id", n_users - 1, tags=(Tags.USER, Tags.USER_ID)),
            create_categorical_column("item_id", n_users - 1, tags=(Tags.ITEM, Tags.ITEM_ID)),
        ]
    )
    return Dataset({"user_id": users, "item_id": users.copy()}, schema=schema), schema


def test_sparse_adagrad_only_touches_looked_up_rows():
    col = create_categorical_column("item", 99)
    table = EmbeddingTable(8, col)
    before = table.to_array().copy()
    opt = SparseEmbeddingOptimizer("adagrad", learning_rate=0.1)
    opt.init_slots(table)
    ids = jnp.array([3, 7, 3])
    grads = jnp.ones((3, 8))
    opt.apply(table, ids, grads, jnp.asarray(0))
    after = table.to_array()
    changed = np.where(np.abs(after - before).sum(axis=1) > 0)[0]
    np.testing.assert_array_equal(changed, [3, 7])
    # duplicate id 3 accumulated twice in the slot
    acc = np.asarray(table.sparse_slots["acc"].value)
    assert acc[3, 0] > acc[7, 0]


def test_sparse_adam_rows():
    col = create_categorical_column("item", 31)
    table = EmbeddingTable(4, col)
    opt = LazyAdam(learning_rate=0.01)
    opt.init_slots(table)
    before = table.to_array().copy()
    opt.apply(table, jnp.array([1, 2]), jnp.ones((2, 4)), jnp.asarray(0))
    after = table.to_array()
    assert np.abs(after[1] - before[1]).sum() > 0
    np.testing.assert_allclose(after[5], before[5])


def test_mf_trains_with_sparse_optimizer():
    ds, schema = identity_dataset()
    m = MatrixFactorizationModel(schema, dim=16)
    m.compile(
        optimizer="adam",
        learning_rate=0.05,
        embedding_optimizer=SparseEmbeddingOptimizer("adam", learning_rate=0.05),
    )
    h = m.fit(ds, epochs=4, batch_size=16, verbose=0)
    losses = h.history["loss"]
    assert losses[-1] < losses[0] * 0.8, losses
    res = m.evaluate(ds, batch_size=16)
    assert res["recall_at_10"] > 0.9


def test_two_tower_sparse_matches_shapes(ecommerce_data):
    tt = TwoTowerModel(ecommerce_data.schema, query_tower=(16, 8))
    tt.compile(optimizer="adam", embedding_optimizer="lazy_adam")
    h = tt.fit(ecommerce_data, epochs=1, batch_size=16, verbose=0)
    assert np.isfinite(h.history["loss"][0])


def test_multi_optimizer_routing():
    ds, schema = identity_dataset()
    m = MatrixFactorizationModel(schema, dim=8)
    m.build(ds)
    multi = MultiOptimizer(
        default=optax.adam(0.05),
        # route the query tower (a Block) to 0-lr SGD -> frozen
        rules=[(m.query_encoder, optax.sgd(0.0))],
    )
    m.compile(optimizer=multi)
    user_before = m.query_encoder.table.to_array().copy()
    m.fit(ds, epochs=1, batch_size=16, verbose=0)
    user_after = m.query_encoder.table.to_array()
    np.testing.assert_allclose(user_before, user_after)  # sgd(0) -> untouched


def test_split_embeddings_on_size():
    tables = [
        EmbeddingTable(4, create_categorical_column("small", 10)),
        EmbeddingTable(4, create_categorical_column("big", 100000)),
    ]
    large, small = split_embeddings_on_size(tables, threshold=1000)
    assert [t.features[0] for t in large] == ["big"]
    assert [t.features[0] for t in small] == ["small"]
