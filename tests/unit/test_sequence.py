import jax.numpy as jnp
import numpy as np
import pytest

from models_tpu.core.types import ModelContext, SequenceFeature
from models_tpu.data import generate_data
from models_tpu.transforms.sequence import (
    MASK_KEY,
    ReplaceMaskedEmbeddings,
    SequenceMaskLast,
    SequenceMaskRandom,
    SequencePredictLast,
    SequencePredictNext,
    SequencePredictRandom,
)
from models_tpu.schema import Schema, Tags, create_categorical_column


def make_batch():
    ids = jnp.array([[1, 2, 3, 4], [5, 6, 0, 0]])
    mask = jnp.array([[True, True, True, True], [True, True, False, False]])
    schema = Schema(
        [
            create_categorical_column(
                "item_id_seq", 100, tags=(Tags.ITEM_ID, Tags.SEQUENCE),
                is_list=True, max_seq_length=4,
            )
        ]
    )
    return schema, {"item_id_seq": SequenceFeature(ids, mask)}


def test_predict_next():
    schema, x = make_batch()
    t = SequencePredictNext(schema, target="item_id_seq")
    ctx = ModelContext(features=x)
    out, targets = t(x, context=ctx)
    tgt = targets["item_id_seq"]
    # row 0: positions 0..2 predict items 2,3,4 ; row 1: position 0 predicts 6
    np.testing.assert_array_equal(np.asarray(tgt.mask),
                                  [[True, True, True, False], [True, False, False, False]])
    np.testing.assert_array_equal(np.asarray(tgt.values)[0, :3], [2, 3, 4])
    assert np.asarray(tgt.values)[1, 0] == 6


def test_predict_last():
    schema, x = make_batch()
    t = SequencePredictLast(schema, target="item_id_seq")
    ctx = ModelContext(features=x)
    out, targets = t(x, context=ctx)
    np.testing.assert_array_equal(np.asarray(targets["item_id_seq"]), [4, 6])
    # inputs keep everything before the last valid
    np.testing.assert_array_equal(
        np.asarray(out["item_id_seq"].mask),
        [[True, True, True, False], [True, False, False, False]],
    )


def test_predict_random_deterministic():
    schema, x = make_batch()
    t = SequencePredictRandom(schema, target="item_id_seq", seed=1)
    ctx = ModelContext(features=x)
    ctx["step"] = 0
    out, targets = t(x, context=ctx)
    vals = np.asarray(targets["item_id_seq"])
    assert vals.shape == (2,)
    # target must be a real item from each row
    assert vals[0] in [2, 3, 4]
    assert vals[1] in [6]


def test_mask_random_always_masks_something():
    schema, x = make_batch()
    t = SequenceMaskRandom(schema, target="item_id_seq", masking_prob=0.01, seed=3)
    ctx = ModelContext(features=x)
    ctx["step"] = 0
    out, targets = t(x, context=ctx)
    m = np.asarray(targets["item_id_seq"].mask)
    assert m.sum(axis=1).min() >= 1
    # masked positions are valid positions
    valid = np.asarray(x["item_id_seq"].mask)
    assert not (m & ~valid).any()


def test_mask_last():
    schema, x = make_batch()
    t = SequenceMaskLast(schema, target="item_id_seq")
    ctx = ModelContext(features=x)
    out, targets = t(x, context=ctx)
    m = np.asarray(targets["item_id_seq"].mask)
    np.testing.assert_array_equal(m, [[False, False, False, True], [False, True, False, False]])
    assert ctx[MASK_KEY] is targets["item_id_seq"].mask


def test_replace_masked_embeddings():
    emb = jnp.ones((2, 4, 8))
    pred_mask = jnp.array([[True, False, False, False], [False, True, False, False]])
    ctx = ModelContext()
    ctx[MASK_KEY] = pred_mask
    block = ReplaceMaskedEmbeddings()
    out = block(SequenceFeature(emb, jnp.ones((2, 4), bool)), context=ctx, training=True)
    arr = np.asarray(out.values)
    assert not np.allclose(arr[0, 0], 1.0)  # replaced
    np.testing.assert_allclose(arr[0, 1], 1.0)  # untouched
    # eval/inference with a mask present: replacement still fires (the reference
    # replaces in eval too — SequenceMaskLast must hide the eval target)
    out2 = block(SequenceFeature(emb, jnp.ones((2, 4), bool)), context=ctx, training=False)
    assert not np.allclose(np.asarray(out2.values)[0, 0], 1.0)
    # no mask in context: untouched
    out3 = block(SequenceFeature(emb, jnp.ones((2, 4), bool)), context=ModelContext(), training=False)
    np.testing.assert_allclose(np.asarray(out3.values), 1.0)


def test_sequence_transforms_config_roundtrip():
    """Sequence transforms serialize through the declarative config tree
    (reference test_seq_predict_*_serialize_deserialize)."""
    from models_tpu.core.config import from_config, to_config
    from models_tpu.data import generate_data
    from models_tpu.transforms.sequence import (
        SequenceMaskLast,
        SequenceMaskRandom,
        SequencePredictLast,
        SequencePredictNext,
    )

    schema = generate_data("sequence-testing", num_rows=8).schema
    for cls, kw in (
        (SequencePredictNext, {}),
        (SequencePredictLast, {}),
        (SequenceMaskRandom, {"masking_prob": 0.3}),
        (SequenceMaskLast, {}),
    ):
        t = cls(schema, target="item_id_seq", **kw)
        tree, arrays = to_config(t)
        t2 = from_config(tree, arrays)
        assert type(t2) is cls
        assert t2.target == "item_id_seq"


def test_replace_masked_embeddings_no_mask_is_noop():
    """Without a prediction mask in context, ReplaceMaskedEmbeddings passes
    inputs through untouched (reference test_replace_masked_input_embeddings_no_target)."""
    import jax.numpy as jnp

    from models_tpu.core.types import ModelContext, SequenceFeature
    from models_tpu.transforms.sequence import ReplaceMaskedEmbeddings

    r = ReplaceMaskedEmbeddings()
    sf = SequenceFeature(jnp.ones((2, 3, 4)), jnp.ones((2, 3), bool))
    out = r(sf, training=True, context=ModelContext())
    np.testing.assert_array_equal(np.asarray(out.values), np.asarray(sf.values))


def test_predict_next_shapes_and_shift():
    """SequencePredictNext: inputs drop the last position, target is the
    shifted sequence (reference test_seq_predict_next_output_shape)."""
    import jax.numpy as jnp

    from models_tpu.core.types import ModelContext, SequenceFeature
    from models_tpu.data import generate_data, sample_batch
    from models_tpu.transforms.sequence import SequencePredictNext

    ds = generate_data("sequence-testing", num_rows=16)
    x, y = sample_batch(ds, batch_size=8)
    pre = SequencePredictNext(ds.schema, target="item_id_seq")
    ctx = ModelContext()
    x2, y2 = pre(x, targets=y, context=ctx)
    # static-shape contract: length stays L; the PREDICTION MASK does the
    # slicing (position t predicts x[t+1]; the last valid position is masked)
    L = np.asarray(x["item_id_seq"].values).shape[1]
    assert np.asarray(x2["item_id_seq"].values).shape[1] == L
    tgt = y2["item_id_seq"] if isinstance(y2, dict) else y2
    assert isinstance(tgt, SequenceFeature)
    inp = np.asarray(x["item_id_seq"].values)
    pm = np.asarray(tgt.mask)
    assert not pm[:, -1].any()  # last position never predicted
    # where predicted: target[t] == input[t+1]
    tv = np.asarray(tgt.values)
    np.testing.assert_array_equal(tv[:, :-1][pm[:, :-1]], inp[:, 1:][pm[:, :-1]])
    # a full-length row predicts L-1 positions
    in_mask = np.asarray(x["item_id_seq"].mask)
    full = in_mask.all(axis=1)
    if full.any():
        assert (pm[full].sum(axis=1) == L - 1).all()
