import jax
import jax.numpy as jnp
import numpy as np
import pytest

from models_tpu.core.types import SequenceFeature
from models_tpu.data import generate_data, sample_batch
from models_tpu.inputs import Continuous, Embeddings, EmbeddingTable, InputBlockV2
from models_tpu.schema import (
    Schema,
    Tags,
    create_categorical_column,
    create_continuous_column,
)


def test_embedding_table_scalar_lookup():
    col = create_categorical_column("item", 100)
    table = EmbeddingTable(16, col)
    ids = jnp.array([1, 5, 99])
    out = table(ids)
    assert out.shape == (3, 16)
    np.testing.assert_allclose(out[0], table.embeddings[1])


def test_embedding_table_sequence():
    col = create_categorical_column("genres", 50, is_list=True, max_seq_length=4)
    table = EmbeddingTable(8, col)
    sf = SequenceFeature(jnp.array([[1, 2, 0, 0]]), jnp.array([[True, True, False, False]]))
    out = table(sf)
    assert isinstance(out, SequenceFeature)
    assert out.values.shape == (1, 4, 8)

    pooled_table = EmbeddingTable(8, col, sequence_combiner="mean")
    pooled = pooled_table(sf)
    assert pooled.shape == (1, 8)
    expected = (pooled_table.embeddings[1] + pooled_table.embeddings[2]) / 2
    np.testing.assert_allclose(pooled[0], expected, rtol=1e-6)


def test_embedding_table_dict_multi_feature():
    cols = [
        create_categorical_column("q_item", 30, domain_name="item"),
        create_categorical_column("c_item", 30, domain_name="item"),
    ]
    table = EmbeddingTable(8, cols)
    out = table({"q_item": jnp.array([1]), "c_item": jnp.array([1])})
    assert set(out) == {"q_item", "c_item"}
    np.testing.assert_allclose(out["q_item"], out["c_item"])


def test_embedding_from_pretrained():
    weights = np.random.randn(10, 4).astype(np.float32)
    table = EmbeddingTable.from_pretrained(weights, trainable=False)
    np.testing.assert_allclose(table(jnp.array([3])), weights[3:4], rtol=1e-6)


def test_embeddings_factory_shared_domain():
    schema = Schema(
        [
            create_categorical_column("a", 100),
            create_categorical_column("b", 200),
            create_categorical_column("q_item", 50, domain_name="item"),
            create_categorical_column("c_item", 50, domain_name="item"),
        ]
    )
    emb = Embeddings(schema, dim=8)
    assert set(emb.keys()) == {"a", "b", "item"}
    out = emb(
        {
            "a": jnp.array([0]),
            "b": jnp.array([1]),
            "q_item": jnp.array([2]),
            "c_item": jnp.array([2]),
        }
    )
    assert set(out) == {"a", "b", "q_item", "c_item"}
    np.testing.assert_allclose(out["q_item"], out["c_item"])


def test_embeddings_dim_inference():
    schema = Schema([create_categorical_column("big", 100000)])
    emb = Embeddings(schema)
    table = emb["big"]
    assert table.dim % 8 == 0
    assert table.dim >= 32


def test_continuous_block():
    schema = Schema(
        [
            create_continuous_column("age"),
            create_continuous_column("scores", is_list=True, max_seq_length=3),
        ]
    )
    block = Continuous(schema)
    out = block(
        {
            "age": jnp.ones((2,)),
            "scores": SequenceFeature(jnp.ones((2, 3)), jnp.ones((2, 3), bool)),
        }
    )
    assert out["age"].shape == (2, 1)
    assert out["scores"].values.shape == (2, 3, 1)


def test_input_block_end_to_end(music_streaming_data):
    schema = music_streaming_data.schema
    block = InputBlockV2(schema)
    x, _ = sample_batch(music_streaming_data, batch_size=8)
    out = block(x)
    assert out.ndim == 2
    assert out.shape[0] == 8
    # multi-hot list columns were mean-pooled into the concat
    assert out.shape[1] > 10


def test_input_block_excludes_targets(music_streaming_data):
    schema = music_streaming_data.schema
    block = InputBlockV2(schema)
    assert "click" not in block.schema.column_names


def test_input_block_tower_split(ecommerce_data):
    schema = ecommerce_data.schema
    user_block = InputBlockV2(schema.select_by_tag(Tags.USER))
    item_block = InputBlockV2(schema.select_by_tag(Tags.ITEM))
    x, _ = sample_batch(ecommerce_data, batch_size=4)
    u = user_block(x)
    v = item_block(x)
    assert u.shape[0] == v.shape[0] == 4
    assert u.shape[1] != v.shape[1] or True


def test_continuous_embedding():
    from models_tpu.inputs import ContinuousEmbedding

    block = ContinuousEmbedding(num_embeddings=6, dim=4)
    out = block(jnp.linspace(-2, 2, 8))
    assert out.shape == (8, 4)
    # different scalar values map to different soft embeddings
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[-1]))


def test_v1_input_block_names(ecommerce_data):
    """V1 constructors: InputBlock(continuous_projection=...), EmbeddingFeatures,
    SequenceEmbeddingFeatures (reference tf/inputs/base.py:40, embedding.py:950/1309)."""
    import jax.numpy as jnp

    import models_tpu as mm
    from models_tpu.core.types import to_device_batch
    from models_tpu.data import Loader
    from models_tpu.inputs.base import InputBlock

    schema = ecommerce_data.schema
    block = InputBlock(schema, continuous_projection=(16,), embedding_dim_default=8)
    x, _ = Loader(ecommerce_data, 8).peek()
    out = block(to_device_batch(x))
    assert out.ndim == 2 and out.shape[0] == 8

    emb = mm.EmbeddingFeatures(schema, dim=8)
    out2 = emb(to_device_batch(x))
    assert isinstance(out2, dict)

    seq_schema = __import__("models_tpu").data.generate_data("sequence-testing", num_rows=8).schema
    seq_emb = mm.SequenceEmbeddingFeatures(seq_schema, dim=8)
    xs, _ = Loader(__import__("models_tpu").data.generate_data("sequence-testing", num_rows=8), 8).peek()
    out3 = seq_emb(to_device_batch(xs))
    from models_tpu.core.types import SequenceFeature

    assert any(isinstance(v, SequenceFeature) and v.values.ndim == 3 for v in out3.values())


def test_fused_embedding_tables_match_individual_lookup():
    """FusedEmbeddingTables: one offset gather == per-feature table lookups,
    and the one-hot-matmul custom VJP == plain gather autodiff."""
    import jax
    import jax.numpy as jnp

    from models_tpu.inputs.embedding import FusedEmbeddingTables
    from models_tpu.schema import create_categorical_column

    cols = [
        create_categorical_column("a", 9),    # padded 16
        create_categorical_column("b", 99),   # padded 104 → stride 104
        create_categorical_column("c", 49),
    ]
    fused = FusedEmbeddingTables(cols, dim=8, seed=3)
    assert fused.stride is not None
    rng = np.random.default_rng(0)
    batch = {
        "a": jnp.asarray(rng.integers(0, 10, 16)),
        "b": jnp.asarray(rng.integers(0, 100, 16)),
        "c": jnp.asarray(rng.integers(0, 50, 16)),
    }
    out = fused(batch)
    table = np.asarray(fused.table.value)
    stride = fused.stride
    for i, name in enumerate(["a", "b", "c"]):
        expect = table[np.asarray(batch[name]) + i * stride]
        np.testing.assert_allclose(np.asarray(out[name]), expect, rtol=1e-6)

    # custom-VJP gradient == plain-gather autodiff gradient
    from models_tpu.inputs.embedding import _onehot_grad_lookup

    local = jnp.stack([batch["a"], batch["b"], batch["c"]], axis=1).astype(jnp.int32)

    def loss_custom(t):
        return jnp.sum(jnp.sin(_onehot_grad_lookup(t, local, stride)))

    def loss_plain(t):
        gids = local + (jnp.arange(3, dtype=jnp.int32) * stride)[None, :]
        return jnp.sum(jnp.sin(jnp.take(t, gids, axis=0)))

    g1 = jax.grad(loss_custom)(fused.table.value)
    g2 = jax.grad(loss_plain)(fused.table.value)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-7)


def test_embeddings_factory_fuses_scalar_domains(ecommerce_data):
    from models_tpu.inputs.embedding import Embeddings, FusedEmbeddingTables

    schema = ecommerce_data.schema.categorical
    block = Embeddings(schema, dim=8, fused=True)
    fused = [b for _, b in block.items() if isinstance(b, FusedEmbeddingTables)]
    assert len(fused) >= 1
    # every fused group is uniform-stride (never the tight-pack fallback)
    assert all(f.stride is not None for f in fused)
    # all scalar single-column domains live in SOME fused group
    fused_names = {n for f in fused for n in f.features}
    assert fused_names == {c.name for c in schema if not c.is_list}


def test_embeddings_factory_never_tight_packs_large_domains():
    """Regression (round 4): a schema mixing small and huge cardinalities
    (ali-ccp layout) must NOT tight-pack everything into one table — the
    packed table's gather backward is an XLA duplicate-id scatter-add that
    measured ~60x slower than separate tables on TPU. Huge domains get their
    own tables; small ones still fuse uniform-stride."""
    from models_tpu.inputs.embedding import (
        _FUSED_STRIDE_MAX,
        Embeddings,
        FusedEmbeddingTables,
    )

    schema = Schema(
        [create_categorical_column("huge_a", 3_000_000),
         create_categorical_column("huge_b", 294_000),
         create_categorical_column("mid", 33_000)]
        + [create_categorical_column(f"small_{i}", 1000 + i) for i in range(6)]
    )
    block = Embeddings(schema, dim=16, fused=True)
    fused = [b for _, b in block.items() if isinstance(b, FusedEmbeddingTables)]
    assert fused, "small domains should still fuse"
    for f in fused:
        assert f.stride is not None and f.stride <= _FUSED_STRIDE_MAX
        assert not any(n.startswith(("huge", "mid")) for n in f.features)
    # the huge domains each get their own plain table
    for name in ("huge_a", "huge_b", "mid"):
        tbl = block[name]
        assert isinstance(tbl, EmbeddingTable)
        assert not isinstance(tbl, FusedEmbeddingTables)
    # forward still produces one embedding per feature
    rng = np.random.default_rng(0)
    batch = {c.name: jnp.asarray(rng.integers(0, int(c.cardinality), 4))
             for c in schema}
    out = block(batch)
    assert set(out.keys()) == {c.name for c in schema}
    assert all(v.shape == (4, 16) for v in out.values())


def test_fused_groups_tiering_and_caps():
    from models_tpu.inputs.embedding import _FUSED_BYTES_MAX, _fused_groups

    # 26 criteo-like equal-cardinality features → exactly one group
    cols = [create_categorical_column(f"C{i}", 1000) for i in range(26)]
    groups = _fused_groups(cols, dim=64)
    assert len(groups) == 1 and len(groups[0]) == 26

    # a big tier splits at the bytes cap
    n_max = _FUSED_BYTES_MAX // (8192 * 512 * 4)
    cols = [create_categorical_column(f"X{i}", 8000) for i in range(n_max + 2)]
    groups = _fused_groups(cols, dim=512)
    assert len(groups) == 2
    assert all(
        sum(1 for _ in g) * 8192 * 512 * 4 <= _FUSED_BYTES_MAX for g in groups
    )


def test_embedding_table_incompatible_features_raise():
    cols = [
        create_categorical_column("a", 10),
        create_categorical_column("b", 20),
    ]
    with pytest.raises(ValueError, match="share its domain"):
        EmbeddingTable(8, cols)


def test_embedding_table_non_trainable_stays_fixed():
    """trainable=False tables must not move during fit (reference
    tests/unit/tf/inputs/test_embedding.py test_non_trainable)."""
    import optax

    from models_tpu.blocks.optimizer import MultiOptimizer
    from models_tpu.core.block import iter_blocks
    from models_tpu.models import MatrixFactorizationModel

    ds = generate_data("movielens-100k", num_rows=128)
    model = MatrixFactorizationModel(ds.schema, dim=8)
    tables = [m for m in iter_blocks(model) if isinstance(m, EmbeddingTable)]
    assert len(tables) >= 2
    frozen, live = tables[0], tables[1]
    before_frozen = frozen.to_array().copy()
    before_live = live.to_array().copy()
    model.compile(
        optimizer=MultiOptimizer(
            default=optax.adam(0.1), rules=[(frozen, optax.set_to_zero())]
        )
    )
    model.fit(ds, epochs=1, batch_size=32, verbose=0)
    np.testing.assert_array_equal(before_frozen, frozen.to_array())
    assert not np.allclose(before_live, live.to_array())


def test_embedding_from_pretrained_trainable_updates():
    weights = np.random.default_rng(0).standard_normal((9, 8)).astype(np.float32)
    t_frozen = EmbeddingTable.from_pretrained(weights, trainable=False)
    t_train = EmbeddingTable.from_pretrained(weights, trainable=True)
    np.testing.assert_array_equal(t_frozen.to_array(), weights)
    np.testing.assert_array_equal(t_train.to_array(), weights)
    import flax.nnx as nnx

    # frozen table is a plain Variable (not Param): excluded from grads
    assert not isinstance(t_frozen.table, nnx.Param)
    assert isinstance(t_train.table, nnx.Param)


def test_embedding_to_dataset_roundtrip():
    weights = np.arange(12, dtype=np.float32).reshape(6, 2)
    t = EmbeddingTable.from_pretrained(weights)
    ds = t.to_dataset()
    cols = ds.to_numpy_dict()
    np.testing.assert_array_equal(cols["id"], np.arange(6))
    got = cols["embedding__values"].reshape(6, 2) if "embedding__values" in cols else cols["embedding"]
    np.testing.assert_allclose(np.asarray(got, np.float32), weights)


def test_embedding_l2_regularization_loss():
    col = create_categorical_column("x", 7)
    t = EmbeddingTable(4, col, l2_reg=0.5)
    expect = 0.5 * float(np.sum(np.square(np.asarray(t.table.value))))
    assert abs(float(t.regularization_loss()) - expect) < 1e-5
    t0 = EmbeddingTable(4, col, l2_reg=0.0)
    assert float(t0.regularization_loss()) == 0.0


def test_embedding_custom_initializer():
    col = create_categorical_column("x", 7)
    init = lambda key, shape, dtype: jnp.full(shape, 0.25, dtype)
    t = EmbeddingTable(4, col, initializer=init)
    np.testing.assert_allclose(t.to_array(), 0.25)


def test_embedding_padded_rows_never_surface():
    col = create_categorical_column("x", 9)  # cardinality 10 -> padded to 16
    t = EmbeddingTable(4, col)
    assert t.padded_rows == 16
    assert t.embeddings.shape == (10, 4)
    assert t.to_dataset().num_rows == 10


@pytest.mark.parametrize("combiner,expect", [
    ("mean", [2.0, 2.0]),   # rows 1,3 (values [1,1],[3,3]) masked-mean
    ("sum", [4.0, 4.0]),
    ("max", [3.0, 3.0]),
    ("last", [3.0, 3.0]),
])
def test_sequence_combiners_respect_mask(combiner, expect):
    col = create_categorical_column("s", 4, is_list=True, max_seq_length=3)
    weights = np.stack([np.full(2, i, np.float32) for i in range(5)])
    t = EmbeddingTable.from_pretrained(weights, col_schema=col, sequence_combiner=combiner)
    sf = SequenceFeature(jnp.array([[1, 3, 2]]), jnp.array([[True, True, False]]))
    out = np.asarray(t(sf))
    np.testing.assert_allclose(out[0], expect, rtol=1e-6)


def test_average_embeddings_by_weight_feature():
    from models_tpu.inputs import AverageEmbeddingsByWeightFeature

    from models_tpu.core.types import ModelContext

    avg = AverageEmbeddingsByWeightFeature("w")
    emb = SequenceFeature(
        jnp.array([[[1.0, 0.0], [3.0, 0.0], [9.0, 9.0]]]),
        jnp.array([[True, True, False]]),
    )
    w = SequenceFeature(jnp.array([[1.0, 3.0, 7.0]]), jnp.array([[True, True, False]]))
    ctx = ModelContext()
    ctx.features = {"w": w}
    out = avg({"emb": emb}, context=ctx)
    # (1*1 + 3*3) / (1+3) = 2.5; masked position excluded despite weight 7
    np.testing.assert_allclose(np.asarray(out["emb"])[0, 0], 2.5, rtol=1e-6)


def test_infer_embedding_dim_multiple_of_8():
    from models_tpu.schema import infer_embedding_dim

    col = create_categorical_column("x", 1000)
    dim = infer_embedding_dim(col)
    assert dim % 8 == 0 and dim >= 8
    raw = infer_embedding_dim(col, ensure_multiple_of_8=False)
    assert raw <= dim


# ---------------------------------------------------------------------------
# TT-Rec tensor-train compressed embeddings (PAPERS.md, arxiv 2101.11714)
# ---------------------------------------------------------------------------

def test_tt_embedding_shapes_and_compression():
    from models_tpu.inputs import TTEmbeddingTable

    col = create_categorical_column("item_id", 999_999)  # 1M rows
    t = TTEmbeddingTable(128, col, ranks=16)
    assert t.compression_ratio > 100  # hundreds-of-x smaller than dense 1M x 128
    out = t(jnp.array([0, 5, 999_999]))
    assert out.shape == (3, 128)
    assert np.isfinite(np.asarray(out)).all()
    # distinct ids -> distinct embeddings
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_tt_embedding_deterministic_and_digitwise():
    from models_tpu.inputs import TTEmbeddingTable

    col = create_categorical_column("x", 63)
    t = TTEmbeddingTable(8, col, ranks=4)
    a = np.asarray(t(jnp.arange(64)))
    b = np.asarray(t(jnp.arange(64)))
    np.testing.assert_array_equal(a, b)
    # matches the materialized table
    np.testing.assert_allclose(a, t.to_array(), rtol=1e-6)


def test_tt_embedding_sequence_combiner():
    from models_tpu.inputs import TTEmbeddingTable

    col = create_categorical_column("s", 30, is_list=True, max_seq_length=3)
    t = TTEmbeddingTable(8, col, ranks=4, sequence_combiner="mean")
    sf = SequenceFeature(jnp.array([[1, 2, 0]]), jnp.array([[True, True, False]]))
    out = np.asarray(t(sf))
    assert out.shape == (1, 8)
    full = t.to_array()
    np.testing.assert_allclose(out[0], (full[1] + full[2]) / 2, rtol=1e-5)


def test_tt_embedding_learns_in_model():
    """A two-tower-style model with a TT-compressed item table learns planted
    identity structure (gradients flow through the TT cores)."""
    import optax
    from flax import nnx

    from models_tpu.inputs import TTEmbeddingTable

    n = 64
    col_u = create_categorical_column("u", n - 1)
    col_i = create_categorical_column("i", n - 1)
    user_t = TTEmbeddingTable(16, col_u, ranks=8, seed=0)
    item_t = TTEmbeddingTable(16, col_i, ranks=8, seed=1)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, n, 512), jnp.int32)

    graphs = [nnx.split(m) for m in (user_t, item_t)]
    (gd_u, st_u), (gd_i, st_i) = graphs
    tx = optax.adam(0.05)
    opt = tx.init((st_u, st_i))

    def loss_fn(states):
        su, si = states
        u = nnx.merge(gd_u, su)(ids)
        v = nnx.merge(gd_i, si)(ids)
        logits = u @ v.T  # identity pairs are positives
        labels = jnp.arange(ids.shape[0])
        # mask duplicate-id false negatives
        dup = ids[None, :] == ids[:, None]
        eye = jnp.eye(ids.shape[0], dtype=bool)
        logits = jnp.where(dup & ~eye, -1e9, logits)
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    states = (st_u, st_i)
    first = float(loss_fn(states))
    for _ in range(30):
        g = jax.grad(loss_fn)(states)
        upd, opt = tx.update(g, opt, states)
        states = optax.apply_updates(states, upd)
    last = float(loss_fn(states))
    assert last < first * 0.5, (first, last)


def test_tt_embedding_in_model_save_load(tmp_path):
    """TT table as the categorical input of a ranking model: trains and
    round-trips through declarative save/load."""
    from models_tpu.core.combinators import ParallelBlock, SequentialBlock
    from models_tpu.blocks.mlp import MLPBlock
    from models_tpu.inputs import TTEmbeddingTable
    from models_tpu.models import Model
    from models_tpu.outputs import BinaryOutput
    from models_tpu.utils.io import load_model

    ds = generate_data("e-commerce", num_rows=96)
    item_col = ds.schema["item_id"]
    body = SequentialBlock(
        [
            ParallelBlock({"item": TTEmbeddingTable(16, item_col, ranks=8)},
                          aggregation="concat"),
            MLPBlock([8]),
        ]
    )
    m = Model(body, BinaryOutput("click"), schema=ds.schema)
    m.compile()
    h = m.fit(ds, epochs=1, batch_size=32, verbose=0)
    assert np.isfinite(h.history["loss"][0])
    path = str(tmp_path / "tt")
    m.save(path)
    import os

    assert os.path.exists(os.path.join(path, "config.json"))
    m2 = load_model(path)
    p1 = np.asarray(m.predict(ds, batch_size=32))
    p2 = np.asarray(m2.predict(ds, batch_size=32))
    np.testing.assert_allclose(p1, p2, rtol=1e-5)


def test_embeddings_factory_tt_threshold():
    """Domains above tt_compression_threshold get TT-compressed tables; small
    domains stay dense."""
    from models_tpu.inputs import Embeddings, TTEmbeddingTable

    schema = Schema(
        [
            create_categorical_column("small", 100),
            create_categorical_column("huge", 1_000_000),
        ]
    )
    emb = Embeddings(schema, dim=16, tt_compression_threshold=10_000, tt_ranks=8)
    assert isinstance(emb["huge"], TTEmbeddingTable)
    assert isinstance(emb["small"], EmbeddingTable)
    out = emb({"small": jnp.array([1]), "huge": jnp.array([999_999])})
    assert out["small"].shape == (1, 16) and out["huge"].shape == (1, 16)


def test_embeddings_tt_takes_precedence_over_fused():
    """Regression: fused=True must not consume TT-eligible huge domains into a
    dense fused table (the HBM-OOM case TT was requested to avoid)."""
    from models_tpu.inputs import Embeddings, TTEmbeddingTable

    schema = Schema(
        [
            create_categorical_column("a", 100),
            create_categorical_column("b", 200),
            create_categorical_column("huge", 5_000_000),
        ]
    )
    emb = Embeddings(schema, dim=16, fused=True, tt_compression_threshold=10_000, tt_ranks=8)
    assert isinstance(emb["huge"], TTEmbeddingTable)
    # the small scalar domains still fuse
    assert "fused" in set(emb.keys())


def test_tt_embedding_l2_reg():
    from models_tpu.inputs import TTEmbeddingTable

    col = create_categorical_column("x", 1000)
    t = TTEmbeddingTable(8, col, ranks=4, l2_reg=0.5)
    expect = 0.5 * sum(
        float(np.sum(np.square(np.asarray(c.value)))) for c in (t.core1, t.core2, t.core3)
    )
    np.testing.assert_allclose(float(t.regularization_loss()), expect, rtol=1e-6)


def test_tt_threshold_on_ecommerce_large():
    """e-commerce-large's 3M-item catalog: tt_compression_threshold routes the
    huge domains to TT tables, small ones stay dense — the intended production
    recipe for giant-catalog CTR models."""
    from models_tpu.data.synthetic import known_schema
    from models_tpu.inputs import Embeddings, TTEmbeddingTable

    schema = known_schema("e-commerce-large")
    emb = Embeddings(schema, dim=16, tt_compression_threshold=500_000, tt_ranks=8)
    huge = [n for n in ("item_id", "item_shop") if isinstance(emb[n], TTEmbeddingTable)]
    assert set(huge) == {"item_id", "item_shop"}
    assert isinstance(emb["user_gender"], EmbeddingTable)
    # a lookup across both kinds works
    out = emb({"item_id": jnp.array([3_000_000]), "user_gender": jnp.array([1])})
    assert out["item_id"].shape == (1, 16) and out["user_gender"].shape == (1, 16)
