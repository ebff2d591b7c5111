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
