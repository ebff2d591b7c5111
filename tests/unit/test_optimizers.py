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


# ---------------------------------------------------------------------------
# LazyAdam semantics vs dense Adam (reference tests/unit/tf/blocks/test_optimizer.py
# test_lazy_adam_sparse / _repeated_indices)
# ---------------------------------------------------------------------------

def test_lazy_adam_touched_rows_match_dense_adam_single_step():
    """On the first step, LazyAdam's update for touched rows equals dense Adam's
    (moments start at zero so laziness can't diverge yet); untouched rows stay."""
    col = create_categorical_column("x", 15)
    table = EmbeddingTable(4, col, seed=0)
    before = table.to_array().copy()

    ids = jnp.array([2, 5, 2], jnp.int32)  # repeated index 2
    grads = jnp.asarray(np.random.default_rng(1).standard_normal((3, 4)), jnp.float32)

    opt = LazyAdam(learning_rate=0.1)
    opt.init_slots(table)
    opt.apply(table, ids, grads, step=jnp.zeros(()))
    after = table.to_array()

    # dense adam on an equivalent dense gradient (rows summed at duplicates)
    dense_g = np.zeros_like(before)
    np.add.at(dense_g, np.asarray(ids), np.asarray(grads))
    tx = optax.adam(0.1, eps=1e-8)
    state = tx.init(jnp.asarray(before))
    updates, _ = tx.update(jnp.asarray(dense_g), state, jnp.asarray(before))
    dense_after = np.asarray(jnp.asarray(before) + updates)

    touched = [2, 5]
    untouched = [i for i in range(16) if i not in touched]
    np.testing.assert_allclose(after[touched], dense_after[touched], rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(after[untouched], before[untouched])


def test_lazy_adam_moments_decay_only_at_touched_rows():
    col = create_categorical_column("x", 7)
    table = EmbeddingTable(4, col, seed=0)
    opt = LazyAdam(learning_rate=0.1)
    opt.init_slots(table)
    g = jnp.ones((1, 4))
    opt.apply(table, jnp.array([1], jnp.int32), g, step=jnp.zeros(()))
    m = np.asarray(table.sparse_slots["m"].value)
    assert np.allclose(m[1], 0.1)  # (1-beta1) * g
    assert np.allclose(m[0], 0.0) and np.allclose(m[3], 0.0)
    # second step touches row 3 only: row 1's m must NOT decay (lazy semantics)
    opt.apply(table, jnp.array([3], jnp.int32), g, step=jnp.ones(()))
    m2 = np.asarray(table.sparse_slots["m"].value)
    assert np.allclose(m2[1], 0.1)
    assert np.allclose(m2[3], 0.1)


def test_sparse_sgd_equals_manual():
    col = create_categorical_column("x", 7)
    table = EmbeddingTable(4, col, seed=0)
    before = table.to_array().copy()
    opt = SparseEmbeddingOptimizer("sgd", learning_rate=0.5)
    opt.init_slots(table)
    g = jnp.ones((2, 4))
    opt.apply(table, jnp.array([0, 0], jnp.int32), g, step=jnp.zeros(()))
    after = table.to_array()
    np.testing.assert_allclose(after[0], before[0] - 0.5 * 2.0, rtol=1e-6)
    np.testing.assert_array_equal(after[1:], before[1:])


def test_sparse_optimizer_invalid_kind():
    with pytest.raises(ValueError, match="Unknown sparse optimizer"):
        SparseEmbeddingOptimizer("rmsprop")


def test_multi_optimizer_different_lrs_produce_different_moves():
    """Routing a tiny LR to one table and a big LR to the other must move them
    by visibly different amounts (the routing is real, not cosmetic)."""
    ds, schema = identity_dataset()
    model = MatrixFactorizationModel(schema, dim=8, seed=4)
    from models_tpu.core.block import iter_blocks

    tables = [b for b in iter_blocks(model) if isinstance(b, EmbeddingTable)]
    b0, b1 = tables[0].to_array().copy(), tables[1].to_array().copy()
    model.compile(
        optimizer=MultiOptimizer(
            default=optax.sgd(1e-6),
            rules=[(tables[1], optax.sgd(0.5))],
        )
    )
    model.fit(ds, epochs=1, batch_size=32, verbose=0)
    move0 = np.abs(tables[0].to_array() - b0).max()
    move1 = np.abs(tables[1].to_array() - b1).max()
    assert move1 > 100 * max(move0, 1e-12)


def test_embedding_optimizer_string_in_compile():
    """compile(embedding_optimizer='lazy_adam') routes table updates through the
    sparse path and still learns the identity structure."""
    ds, schema = identity_dataset()
    model = MatrixFactorizationModel(schema, dim=8, seed=1)
    model.compile(learning_rate=0.05, embedding_optimizer="lazy_adam")
    h = model.fit(ds, epochs=3, batch_size=64, shuffle=False, verbose=0)
    assert h.history["loss"][-1] < h.history["loss"][0]


def test_low_precision_optimizer_state_unit():
    """bf16-at-rest state: slots live in bf16, update math matches fp32 within
    bf16 resolution, and integer leaves (adam count) stay untouched."""
    import jax

    from models_tpu.blocks.optimizer import low_precision_optimizer_state

    params = {"w": jnp.asarray(np.random.default_rng(0).standard_normal((8, 4)), jnp.float32)}
    grads = {"w": jnp.full((8, 4), 0.25, jnp.float32)}

    hi = optax.adam(0.1)
    lo = low_precision_optimizer_state(optax.adam(0.1), "bfloat16")

    s_hi, s_lo = hi.init(params), lo.init(params)
    float_dtypes = {
        x.dtype for x in jax.tree.leaves(s_lo) if jnp.issubdtype(x.dtype, jnp.floating)
    }
    assert float_dtypes == {jnp.dtype(jnp.bfloat16)}
    counts = [x for x in jax.tree.leaves(s_lo) if jnp.issubdtype(x.dtype, jnp.integer)]
    assert counts, "adam count leaf must survive as an integer"

    for _ in range(3):
        u_hi, s_hi = hi.update(grads, s_hi, params)
        u_lo, s_lo = lo.update(grads, s_lo, params)
    np.testing.assert_allclose(
        np.asarray(u_lo["w"], np.float32), np.asarray(u_hi["w"]), rtol=2e-2, atol=1e-3
    )
    # state stays bf16 after updates too
    assert all(
        x.dtype == jnp.bfloat16
        for x in jax.tree.leaves(s_lo)
        if jnp.issubdtype(x.dtype, jnp.floating)
    )


def test_optimizer_state_dtype_trajectory_tolerance():
    """compile(optimizer_state_dtype='bfloat16') trains to ~the fp32 loss."""
    ds, _ = identity_dataset()

    def run(**kw):
        m = MatrixFactorizationModel(ds.schema, dim=8)
        m.compile(optimizer="adagrad", learning_rate=0.1, **kw)
        h = m.fit(ds, epochs=2, batch_size=64, verbose=0)
        return h.history["loss"]

    base = run()
    lowp = run(optimizer_state_dtype="bfloat16")
    assert np.isfinite(lowp).all()
    np.testing.assert_allclose(lowp, base, rtol=5e-2)


def test_optimizer_state_dtype_rejects_multi_optimizer():
    ds, _ = identity_dataset()
    m = MatrixFactorizationModel(ds.schema, dim=8)
    mo = MultiOptimizer(default=optax.adam(1e-3), rules=[("user", optax.sgd(0.1))])
    with pytest.raises(ValueError, match="optimizer_state_dtype"):
        m.compile(optimizer=mo, optimizer_state_dtype="bfloat16")


def test_learning_rate_schedule_dense_matches_constant():
    """compile(learning_rate=<schedule>) (Keras LearningRateSchedule parity):
    a constant schedule must trace the identical trajectory as the float."""
    ds, _ = identity_dataset()

    def run(lr):
        m = MatrixFactorizationModel(ds.schema, dim=8)
        m.compile(optimizer="adam", learning_rate=lr)
        return m.fit(ds, epochs=3, batch_size=64, shuffle=False, verbose=0).history["loss"]

    np.testing.assert_allclose(run(0.05), run(optax.constant_schedule(0.05)), rtol=1e-6)
    # a decaying schedule still learns
    dec = run(optax.exponential_decay(0.05, transition_steps=5, decay_rate=0.5))
    assert dec[-1] < dec[0]


def test_learning_rate_schedule_sparse_embedding_optimizer():
    """SparseEmbeddingOptimizer accepts a step->lr schedule; zero lr is a
    no-op, constant schedule matches the float path row-for-row."""
    col = create_categorical_column("item", 99)

    def one_step(lr):
        table = EmbeddingTable(8, col, seed=11)
        opt = SparseEmbeddingOptimizer("adagrad", learning_rate=lr)
        opt.init_slots(table)
        ids = jnp.array([3, 7, 3])
        grads = jnp.ones((3, 8))
        opt.apply(table, ids, grads, jnp.asarray(4))
        return table.to_array()

    np.testing.assert_allclose(
        one_step(0.1), one_step(optax.constant_schedule(0.1)), rtol=1e-6
    )
    table0 = EmbeddingTable(8, col, seed=11).to_array()
    np.testing.assert_array_equal(one_step(lambda step: 0.0), table0)


def test_sparse_optimizer_continuation_across_fits():
    """fit()+fit() with the row-sparse embedding optimizer continues BOTH the
    dense slots (side table) and the sparse per-table slots (module state):
    split fits must match one long fit."""
    ds, schema = identity_dataset()

    def build():
        m = MatrixFactorizationModel(schema, dim=8)
        m.compile(optimizer="adam", learning_rate=0.05,
                  embedding_optimizer="lazy_adam")
        return m

    one = build().fit(ds, epochs=6, batch_size=64, shuffle=False, verbose=0).history["loss"]
    m = build()
    a = m.fit(ds, epochs=3, batch_size=64, shuffle=False, verbose=0).history["loss"]
    b = m.fit(ds, epochs=3, batch_size=64, shuffle=False, verbose=0).history["loss"]
    np.testing.assert_allclose(a + b, one, rtol=1e-5)


def test_bf16_table_sparse_update_stochastic_rounding_unit():
    """bf16-at-rest table + sparse adagrad: table stays bf16, slots stay fp32,
    only looked-up rows move, and tiny updates land in EXPECTATION (the whole
    point of stochastic rounding — round-to-nearest would drop them all)."""
    col = create_categorical_column("item", 99)
    table = EmbeddingTable(8, col, dtype=jnp.bfloat16, seed=3)
    assert table.table.value.dtype == jnp.bfloat16
    opt = SparseEmbeddingOptimizer("sgd", learning_rate=1.0)
    opt.init_slots(table)

    # drive row 5 (value ~0.05 scale) with an update ~1e-4 x its ulp scale:
    # nearest-rounding would be a no-op every step; SR must move the mean
    before = table.to_array()[5].astype(np.float32).copy()
    tiny = -1e-5  # update = -lr * grad = +1e-5
    moved = []
    for step in range(300):
        g = jnp.zeros((1, 8), jnp.float32) + tiny
        opt.apply(table, jnp.asarray([5]), g, jnp.asarray(step))
    after = table.to_array()[5].astype(np.float32)
    drift = (after - before).mean()
    # expectation: 300 steps x 1e-5 = 3e-3 of drift (rtol loose: SR variance)
    np.testing.assert_allclose(drift, 3e-3, rtol=0.5)
    assert table.table.value.dtype == jnp.bfloat16


def test_bf16_tables_train_end_to_end():
    """MatrixFactorizationModel(table_dtype=bf16) + sparse optimizer tracks the
    fp32-table trajectory (the stochastic-rounding quality claim) and the
    dense optimizer path refuses bf16 tables with a clear error."""
    ds, schema = identity_dataset()

    def run(dt):
        m = MatrixFactorizationModel(schema, dim=16, table_dtype=dt)
        m.compile(optimizer="adam", learning_rate=0.5,
                  embedding_optimizer="adagrad")
        h = m.fit(ds, epochs=12, batch_size=64, shuffle=False, verbose=0)
        return m, h.history["loss"]

    m32, l32 = run(None)
    mbf, lbf = run(jnp.bfloat16)
    assert l32[-1] < l32[0] - 0.03  # both actually learned
    assert lbf[-1] < lbf[0] - 0.03
    np.testing.assert_allclose(lbf, l32, rtol=2e-2)  # SR matches fp32 quality
    for t in mbf._embedding_tables():
        if t.trainable:
            assert t.table.value.dtype == jnp.bfloat16

    m2 = MatrixFactorizationModel(schema, dim=16, table_dtype=jnp.bfloat16)
    m2.compile(optimizer="adam", learning_rate=0.05)  # dense path
    with pytest.raises(ValueError, match="stochastic"):
        m2.fit(ds, epochs=1, batch_size=64, verbose=0)


def test_sparse_threshold_routes_small_tables_dense():
    """compile(sparse_threshold=N): tables at or below N ride the dense optax
    transform (the row-sparse update's fixed sort+scatter costs lose below
    ~1M rows — CLAUDE.md crossover), larger tables keep the scatter path.
    Both kinds must train."""
    import jax.numpy as jnp

    from models_tpu.models import MatrixFactorizationModel

    rng = np.random.default_rng(3)
    n = 600
    users = rng.integers(0, 5000, n).astype(np.int32)
    items = (users % 40).astype(np.int32)
    schema = Schema(
        [
            create_categorical_column("user_id", 4999, tags=(Tags.USER, Tags.USER_ID)),
            create_categorical_column("item_id", 39, tags=(Tags.ITEM, Tags.ITEM_ID)),
        ]
    )
    ds = Dataset({"user_id": users, "item_id": items}, schema=schema)
    m = MatrixFactorizationModel(schema, dim=16)
    m.compile(
        optimizer="adagrad",
        learning_rate=0.2,
        embedding_optimizer="adagrad",
        sparse_threshold=1000,
    )
    tables = {t.input_dim: t for t in m._embedding_tables()}
    user_t = tables[max(tables)]   # 5000-row table
    item_t = tables[min(tables)]   # 40-row table
    u_before = user_t.to_array().copy()
    i_before = item_t.to_array().copy()
    h = m.fit(ds, epochs=3, batch_size=100, verbose=0)

    # routing: user table sparse (tap key + slots), item table dense (neither)
    assert user_t._tap_key is not None
    assert item_t._tap_key is None
    assert user_t.sparse_slots is not None and len(user_t.sparse_slots)
    assert not (item_t.sparse_slots is not None and len(item_t.sparse_slots))
    # both tables actually moved
    assert np.abs(user_t.to_array() - u_before).sum() > 0
    assert np.abs(item_t.to_array() - i_before).sum() > 0
    # sparse semantics: never-looked-up user rows untouched
    unseen = np.setdiff1d(np.arange(5000), users)[:32]
    np.testing.assert_allclose(user_t.to_array()[unseen], u_before[unseen])
    # dense param split excludes only the routed table
    dp = m._dense_params()
    flat = {"/".join(map(str, k)): v for k, v in dp.flat_state()}
    dense_rows = {v.value.shape[0] for k, v in flat.items() if "table" in k}
    assert user_t.padded_rows not in dense_rows
    assert item_t.padded_rows in dense_rows


def test_sparse_threshold_all_dense_warns_and_trains():
    ds, schema = identity_dataset()
    m = MatrixFactorizationModel(schema, dim=8)
    m.compile(
        optimizer="adagrad",
        learning_rate=0.2,
        embedding_optimizer="adagrad",
        sparse_threshold=10_000_000,
    )
    with pytest.warns(UserWarning, match="routed every"):
        h = m.fit(ds, epochs=2, batch_size=64, verbose=0)
    assert np.isfinite(h.history["loss"]).all()


def test_low_precision_table_always_routed_sparse():
    """bf16 tables cannot train dense (round-to-nearest drops small updates);
    sparse_threshold must not demote them."""
    import jax.numpy as jnp

    ds, schema = identity_dataset()
    m = MatrixFactorizationModel(schema, dim=8, table_dtype=jnp.bfloat16)
    m.compile(
        optimizer="adagrad",
        learning_rate=0.2,
        embedding_optimizer="adagrad",
        sparse_threshold=10_000_000,
    )
    m.fit(ds, epochs=1, batch_size=64, verbose=0)
    assert all(t._tap_key is not None for t in m._embedding_tables())


def test_sparse_optimizer_trains_embedding_encoder_query_table():
    """Regression: EmbeddingEncoder dropped the call context, so the QUERY
    table of MatrixFactorizationModel never received a tap — it stayed frozen
    under embedding_optimizer= while the candidate table trained (the in-batch
    objective still reduced loss, hiding the freeze)."""
    ds, schema = identity_dataset()
    m = MatrixFactorizationModel(schema, dim=8)
    m.compile(optimizer="adagrad", learning_rate=0.2, embedding_optimizer="adagrad")
    q_table = m.query_encoder.table
    before = q_table.to_array().copy()
    m.fit(ds, epochs=1, batch_size=64, verbose=0)
    assert np.abs(q_table.to_array() - before).sum() > 0
