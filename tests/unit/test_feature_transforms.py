import jax
import jax.numpy as jnp
import numpy as np
import pytest

from models_tpu.core.types import ModelContext, SequenceFeature
from models_tpu.transforms.features import (
    BroadcastToSequence,
    CategoryEncoding,
    HashedCross,
    HashedCrossAll,
    ToTarget,
)
from models_tpu.schema import Schema, Tags, create_categorical_column, create_continuous_column


def cat_schema():
    return Schema(
        [
            create_categorical_column("a", 5),
            create_categorical_column("b", 3),
        ]
    )


def test_category_encoding_multi_hot():
    enc = CategoryEncoding(cat_schema(), output_mode="multi_hot")
    out = enc({"a": jnp.array([0, 2]), "b": jnp.array([1, 1])})
    assert out.shape == (2, 6 + 4)
    arr = np.asarray(out)
    assert arr[0, 0] == 1 and arr[0, 2] == 0
    assert arr[1, 2] == 1
    assert arr[0, 6 + 1] == 1


def test_category_encoding_count_mode_with_lists():
    schema = Schema([create_categorical_column("tags", 4, is_list=True, max_seq_length=3)])
    enc = CategoryEncoding(schema, output_mode="count")
    sf = SequenceFeature(jnp.array([[1, 1, 2]]), jnp.array([[True, True, True]]))
    out = np.asarray(enc({"tags": sf}))
    assert out[0, 1] == 2.0  # counted twice
    assert out[0, 2] == 1.0
    # multi_hot clips to 1
    enc2 = CategoryEncoding(schema, output_mode="multi_hot")
    out2 = np.asarray(enc2({"tags": sf}))
    assert out2[0, 1] == 1.0


def test_hashed_cross_deterministic_and_bounded():
    hc = HashedCross(cat_schema(), num_bins=16, output_mode="int")
    x = {"a": jnp.array([1, 2, 1]), "b": jnp.array([0, 1, 0])}
    out1, out2 = np.asarray(hc(x)), np.asarray(hc(x))
    np.testing.assert_array_equal(out1, out2)
    assert (out1 >= 0).all() and (out1 < 16).all()
    assert out1[0] == out1[2]  # same feature combo -> same bucket
    # different combos usually differ
    assert out1[0] != out1[1]


def test_hashed_cross_all_one_hot():
    schema = Schema(
        [
            create_categorical_column("a", 5),
            create_categorical_column("b", 3),
            create_categorical_column("c", 7),
        ]
    )
    hca = HashedCrossAll(schema, num_bins=8, max_level=2, output_mode="one_hot")
    out = hca({"a": jnp.array([1]), "b": jnp.array([2]), "c": jnp.array([3])})
    assert out.shape == (1, 3 * 8)  # 3 pairwise crosses


def test_to_target_moves_columns():
    schema = Schema(
        [create_categorical_column("x", 5), create_continuous_column("rating")]
    )
    t = ToTarget(schema, "rating")
    ctx = ModelContext()
    out = t({"x": jnp.array([1]), "rating": jnp.array([4.0])}, context=ctx, targets={})
    assert "rating" not in out
    assert "rating" in ctx.targets
    new_schema = t.transform_schema(schema)
    assert new_schema["rating"].is_target


def test_broadcast_to_sequence():
    ctx_schema = Schema([create_continuous_column("age")])
    seq_schema = Schema(
        [create_categorical_column("items", 10, is_list=True, max_seq_length=4)]
    )
    b = BroadcastToSequence(ctx_schema, seq_schema)
    mask = jnp.array([[True, True, False, False]])
    out = b(
        {
            "age": jnp.array([3.0]),
            "items": SequenceFeature(jnp.array([[1, 2, 0, 0]]), mask),
        }
    )
    assert isinstance(out["age"], SequenceFeature)
    assert out["age"].values.shape == (1, 4, 1)
    np.testing.assert_allclose(np.asarray(out["age"].values[0, :, 0]), 3.0)


def test_cond_and_mapvalues():
    from models_tpu.core import Cond, Lambda, MapValues

    def is_positive(x):
        return jnp.all(x > 0)

    def double(x):
        return x * 2

    def negate(x):
        return -x

    c = Cond(Lambda(is_positive), Lambda(double), Lambda(negate))
    np.testing.assert_allclose(np.asarray(c(jnp.ones(3))), 2.0)
    np.testing.assert_allclose(np.asarray(c(-jnp.ones(3))), 1.0)

    mv = MapValues(Lambda(double))
    out = mv({"a": jnp.ones(2), "b": 2 * jnp.ones(2)})
    np.testing.assert_allclose(np.asarray(out["b"]), 4.0)


def test_pretrained_embeddings_block():
    from models_tpu.inputs import PretrainedEmbeddings
    from models_tpu.schema import ColumnSchema

    schema = Schema(
        [
            ColumnSchema("txt_emb", tags=(Tags.EMBEDDING, Tags.CONTINUOUS), is_list=True,
                         value_count=(8, 8)),
        ]
    )
    block = PretrainedEmbeddings(schema)
    sf = SequenceFeature(jnp.ones((2, 8, 4)), jnp.ones((2, 8), bool))
    out = block({"txt_emb": sf})
    assert out["txt_emb"].shape == (2, 4)  # mean-pooled


def test_category_encoding_one_hot_exact():
    enc = CategoryEncoding(cat_schema(), output_mode="one_hot")
    out = np.asarray(enc({"a": jnp.array([3]), "b": jnp.array([0])}))
    # cardinalities include the OOV/padding slot: a -> 6, b -> 4
    assert out.shape == (1, 10)
    expect = np.zeros((1, 10), np.float32)
    expect[0, 3] = 1.0
    expect[0, 6 + 0] = 1.0
    np.testing.assert_array_equal(out, expect)


def test_category_encoding_invalid_mode_raises():
    with pytest.raises(ValueError, match="output_mode"):
        CategoryEncoding(cat_schema(), output_mode="bogus")


def test_category_encoding_no_columns_raises():
    enc = CategoryEncoding(cat_schema())
    with pytest.raises(ValueError, match="none of its columns"):
        enc({"other": jnp.array([1])})


def test_category_encoding_respects_mask():
    """Padded list positions must not contribute to the encoding."""
    schema = Schema([create_categorical_column("tags", 4, is_list=True, max_seq_length=3)])
    enc = CategoryEncoding(schema, output_mode="count")
    sf = SequenceFeature(jnp.array([[1, 2, 2]]), jnp.array([[True, False, False]]))
    out = np.asarray(enc({"tags": sf}))
    assert out[0, 1] == 1.0
    assert out[0, 2] == 0.0  # masked positions excluded


def test_hashed_cross_one_hot_sums_to_one():
    hc = HashedCross(cat_schema(), num_bins=16, output_mode="one_hot")
    out = np.asarray(hc({"a": jnp.array([1, 2, 3]), "b": jnp.array([0, 1, 2])}))
    assert out.shape == (3, 16)
    np.testing.assert_array_equal(out.sum(axis=1), 1.0)


def test_hashed_cross_mismatched_list_lengths_raise():
    schema = Schema(
        [
            create_categorical_column("x", 5, is_list=True, max_seq_length=2),
            create_categorical_column("tags", 4, is_list=True, max_seq_length=3),
        ]
    )
    hc = HashedCross(schema, num_bins=8)
    sf2 = SequenceFeature(jnp.array([[1, 2]]), jnp.ones((1, 2), bool))
    sf3 = SequenceFeature(jnp.array([[1, 2, 0]]), jnp.ones((1, 3), bool))
    with pytest.raises(ValueError, match="sequence length"):
        hc({"x": sf2, "tags": sf3})


def test_hashed_cross_sensitive_to_every_input():
    """Changing either crossed feature must (generically) change the bucket."""
    hc = HashedCross(cat_schema(), num_bins=1000)
    base = int(hc({"a": jnp.array([1]), "b": jnp.array([1])})[0])
    diff_a = int(hc({"a": jnp.array([2]), "b": jnp.array([1])})[0])
    diff_b = int(hc({"a": jnp.array([1]), "b": jnp.array([2])})[0])
    assert base != diff_a and base != diff_b


def test_hashed_cross_fewer_bins_than_combinations():
    hc = HashedCross(cat_schema(), num_bins=4)
    a, b = np.meshgrid(np.arange(5), np.arange(3))
    out = np.asarray(hc({"a": jnp.asarray(a.ravel()), "b": jnp.asarray(b.ravel())}))
    assert out.min() >= 0 and out.max() < 4
    assert len(np.unique(out)) > 1  # spread across buckets


def test_hashed_cross_all_levels_and_ignore():
    schema = Schema(
        [
            create_categorical_column("a", 5),
            create_categorical_column("b", 3),
            create_categorical_column("c", 7),
        ]
    )
    hca = HashedCrossAll(
        schema, num_bins=8, min_level=2, max_level=3, output_mode="one_hot",
        ignore_combinations=[("a", "b")],
    )
    out = hca({"a": jnp.array([1]), "b": jnp.array([2]), "c": jnp.array([3])})
    # pairs: ac, bc (ab ignored) + triple abc = 3 crosses
    assert out.shape == (1, 3 * 8)


def test_broadcast_to_sequence_requires_sequence_feature():
    b = BroadcastToSequence(
        Schema([create_continuous_column("age")]),
        Schema([create_categorical_column("items", 10, is_list=True, max_seq_length=4)]),
    )
    with pytest.raises(ValueError, match="SequenceFeature"):
        b({"age": jnp.array([3.0]), "items": jnp.array([1, 2])})


def test_broadcast_2d_context():
    ctx_schema = Schema([create_continuous_column("vec")])
    seq_schema = Schema(
        [create_categorical_column("items", 10, is_list=True, max_seq_length=3)]
    )
    b = BroadcastToSequence(ctx_schema, seq_schema)
    out = b(
        {
            "vec": jnp.array([[1.0, 2.0]]),
            "items": SequenceFeature(jnp.array([[1, 2, 0]]), jnp.array([[True, True, False]])),
        }
    )
    assert out["vec"].values.shape == (1, 3, 2)
    np.testing.assert_allclose(np.asarray(out["vec"].values[0, 2]), [1.0, 2.0])


def test_expand_dims_dict():
    from models_tpu.transforms.features import ExpandDims

    ed = ExpandDims(axis=-1)
    sf = SequenceFeature(jnp.ones((2, 3)), jnp.ones((2, 3), bool))
    out = ed({"x": jnp.ones((2,)), "seq": sf})
    assert out["x"].shape == (2, 1)
    assert out["seq"] is sf  # SequenceFeatures pass through


def test_prepare_features_pads_values_offsets():
    from models_tpu.transforms.features import PrepareFeatures

    schema = Schema([create_categorical_column("items", 10, is_list=True, max_seq_length=4)])
    pf = PrepareFeatures(schema)
    values = np.array([1, 2, 3, 4, 5], np.int64)
    offsets = np.array([0, 2, 5], np.int64)
    out = pf({"items": (values, offsets)})
    sf = out["items"]
    assert isinstance(sf, SequenceFeature)
    np.testing.assert_array_equal(np.asarray(sf.values), [[1, 2, 0, 0], [3, 4, 5, 0]])
    np.testing.assert_array_equal(
        np.asarray(sf.mask), [[True, True, False, False], [True, True, True, False]]
    )


def test_l2norm_unit_norm_and_mask_passthrough():
    from models_tpu.transforms.regularization import L2Norm

    n = L2Norm()
    x = jnp.array([[3.0, 4.0]])
    np.testing.assert_allclose(np.asarray(n(x)), [[0.6, 0.8]], rtol=1e-6)
    sf = SequenceFeature(jnp.ones((1, 2, 4)), jnp.array([[True, False]]))
    out = n({"e": sf})
    assert isinstance(out["e"], SequenceFeature)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out["e"].values), axis=-1), 1.0, rtol=1e-5)


def test_hashed_cross_list_features():
    """HashedCross over list features: positionwise cross, scalar broadcast,
    AND-combined masks (reference supports sparse crosses,
    tf/transforms/features.py:694)."""
    import jax.numpy as jnp

    from models_tpu.core.types import SequenceFeature
    from models_tpu.schema import Schema, create_categorical_column
    from models_tpu.transforms.features import HashedCross

    schema = Schema([
        create_categorical_column("cat_a", 50, is_list=True),
        create_categorical_column("cat_b", 50),
    ])
    cross = HashedCross(schema, num_bins=97)
    a = SequenceFeature(
        jnp.array([[1, 2, 3], [4, 5, 0]], jnp.int32),
        jnp.array([[True, True, True], [True, True, False]]),
    )
    b = jnp.array([7, 9], jnp.int32)
    out = cross({"cat_a": a, "cat_b": b})
    assert isinstance(out, SequenceFeature)
    assert out.values.shape == (2, 3)
    assert bool(out.mask[1, 2]) is False
    assert int(out.values[1, 2]) == 0  # masked position pinned to bucket 0
    assert (jnp.asarray(out.values) >= 0).all() and (jnp.asarray(out.values) < 97).all()
    # positionwise: changing one position only changes that position
    a2 = SequenceFeature(a.values.at[0, 1].set(30), a.mask)
    out2 = cross({"cat_a": a2, "cat_b": b})
    assert int(out2.values[0, 0]) == int(out.values[0, 0])
    assert int(out2.values[0, 2]) == int(out.values[0, 2])
    # list x list with differing masks ANDs them
    schema2 = Schema([
        create_categorical_column("cat_a", 50, is_list=True),
        create_categorical_column("cat_c", 50, is_list=True),
    ])
    c = SequenceFeature(
        jnp.array([[1, 1, 1], [2, 2, 2]], jnp.int32),
        jnp.array([[True, False, True], [True, True, True]]),
    )
    out3 = HashedCross(schema2, num_bins=97)({"cat_a": a, "cat_c": c})
    assert bool(out3.mask[0, 1]) is False and bool(out3.mask[1, 2]) is False
