import jax
import jax.numpy as jnp
import numpy as np
import pytest

from models_tpu.core import (
    Block,
    Filter,
    Lambda,
    NoOp,
    ParallelBlock,
    ResidualBlock,
    SequentialBlock,
    SequenceFeature,
)
from models_tpu.core.aggregation import (
    ConcatFeatures,
    ElementwiseSum,
    SequenceAggregator,
    StackFeatures,
    sequence_last,
    sequence_mean,
)
from models_tpu.blocks import Dense, MLPBlock
from models_tpu.schema import Schema, Tags, create_categorical_column, create_continuous_column


def double(x):
    return x * 2.0


def add_one(x):
    return x + 1.0


def test_sequential_and_rshift():
    block = Lambda(double) >> Lambda(add_one)
    out = block(jnp.ones((2, 3)))
    np.testing.assert_allclose(out, np.full((2, 3), 3.0))
    assert isinstance(block, SequentialBlock)
    assert len(block) == 2


def test_parallel_named_branches():
    pb = ParallelBlock({"a": Lambda(double), "b": Lambda(add_one)})
    out = pb(jnp.ones((2, 2)))
    assert set(out) == {"a", "b"}
    np.testing.assert_allclose(out["a"], 2.0 * np.ones((2, 2)))


def test_parallel_aggregation_concat():
    pb = ParallelBlock({"a": NoOp(), "b": NoOp()}, aggregation="concat")
    out = pb(jnp.ones((2, 3)))
    assert out.shape == (2, 6)


def test_parallel_schema_filtering():
    schema_a = Schema([create_continuous_column("x")])
    schema_b = Schema([create_continuous_column("y")])

    class Picker(Block):
        def __init__(self, schema):
            super().__init__(schema=schema)

        def __call__(self, inputs, **kwargs):
            assert set(inputs) == set(self.schema.column_names)
            return sum(inputs.values())

    pb = ParallelBlock({"a": Picker(schema_a), "b": Picker(schema_b)})
    out = pb({"x": jnp.ones((2, 1)), "y": 2 * jnp.ones((2, 1))})
    np.testing.assert_allclose(out["b"], 2.0 * np.ones((2, 1)))


def test_filter_by_names_and_tags():
    inputs = {"x": jnp.zeros((2, 1)), "y": jnp.ones((2, 1))}
    assert set(Filter(["x"])(inputs)) == {"x"}
    schema = Schema(
        [create_continuous_column("x", tags=Tags.USER), create_continuous_column("y")]
    )
    f = Filter(Tags.USER)
    f.set_schema(schema)
    assert set(f(inputs)) == {"x"}
    assert set(Filter(["x"], exclude=True)(inputs)) == {"y"}


def test_residual():
    rb = ResidualBlock(Lambda(double))
    out = rb(jnp.ones((2, 2)))
    np.testing.assert_allclose(out, 3.0 * np.ones((2, 2)))


def test_aggregations():
    a = jnp.ones((2, 3))
    b = 2 * jnp.ones((2, 3))
    assert ConcatFeatures()({"a": a, "b": b}).shape == (2, 6)
    assert StackFeatures()({"a": a, "b": b}).shape == (2, 2, 3)
    np.testing.assert_allclose(ElementwiseSum()({"a": a, "b": b}), 3 * np.ones((2, 3)))


def test_concat_promotes_scalars():
    out = ConcatFeatures()({"a": jnp.ones((4,)), "b": jnp.ones((4, 2))})
    assert out.shape == (4, 3)


def test_concat_mixed_rank_raises():
    with pytest.raises(ValueError, match="mixed tensor ranks"):
        ConcatFeatures()({"a": jnp.ones((2, 3)), "b": jnp.ones((2, 4, 3))})


def test_sequence_mean_respects_mask():
    values = jnp.arange(12, dtype=jnp.float32).reshape(2, 3, 2)
    mask = jnp.array([[True, True, False], [True, False, False]])
    sf = SequenceFeature(values, mask)
    out = sequence_mean(sf)
    np.testing.assert_allclose(out[0], values[0, :2].mean(axis=0))
    np.testing.assert_allclose(out[1], values[1, 0])


def test_sequence_last():
    values = jnp.arange(12, dtype=jnp.float32).reshape(2, 3, 2)
    mask = jnp.array([[True, True, False], [True, True, True]])
    out = sequence_last(SequenceFeature(values, mask))
    np.testing.assert_allclose(out[0], values[0, 1])
    np.testing.assert_allclose(out[1], values[1, 2])


def test_dense_lazy_build_and_jit():
    d = Dense(4, activation="relu")
    x = jnp.ones((2, 3))
    out = d(x)  # eager build
    assert out.shape == (2, 4)
    assert d.kernel.value.shape == (3, 4)

    # after build the block is jittable via nnx
    from flax import nnx

    @nnx.jit
    def f(block, x):
        return block(x)

    out2 = f(d, x)
    np.testing.assert_allclose(out, out2, rtol=1e-6)


def test_unbuilt_dense_under_jit_raises():
    d = Dense(4)

    def f(x):
        return d(x)

    with pytest.raises(Exception, match="not built"):
        jax.jit(f)(jnp.ones((2, 3)))


def test_mlp_block():
    mlp = MLPBlock([8, 4], dropout=0.1)
    out = mlp(jnp.ones((2, 6)), training=False)
    assert out.shape == (2, 4)
    out_t = mlp(jnp.ones((2, 6)), training=True)
    assert out_t.shape == (2, 4)


def test_repeat():
    block = MLPBlock([4])
    stacked = block.repeat(3)
    x = jnp.ones((2, 4))
    assert stacked(x).shape == (2, 4)
    # copies do not share parameters
    stacked(x)  # build all
    # nested SequentialBlocks flatten, so layers are the Dense blocks directly
    k0 = stacked[0].kernel.value
    k1 = stacked[1].kernel.value
    assert k0 is not k1


def test_batch_norm_trains_in_compiled_step_and_tracks_stats():
    """MLPBlock(normalization='batch_norm') must work inside the jitted train
    step (running stats flow through the engine's functional state updates) and
    the running mean must converge toward the input distribution's mean."""
    import numpy as np

    from models_tpu.blocks.mlp import BatchNorm
    from models_tpu.core.block import iter_blocks
    from models_tpu.core.combinators import SequentialBlock
    from models_tpu.data import generate_data
    from models_tpu.inputs import InputBlockV2
    from models_tpu.models import Model
    from models_tpu.outputs import BinaryOutput
    from models_tpu.blocks.mlp import MLPBlock

    ds = generate_data("e-commerce", num_rows=128)
    body = SequentialBlock(
        [InputBlockV2(ds.schema, dim=8), MLPBlock([16], normalization="batch_norm")]
    )
    m = Model(body, BinaryOutput("click"), schema=ds.schema)
    m.compile()
    h = m.fit(ds, epochs=2, batch_size=32, verbose=0)
    assert np.isfinite(h.history["loss"]).all()
    bn = [b for b in iter_blocks(m) if isinstance(b, BatchNorm)][0]
    assert float(np.abs(np.asarray(bn.mean.value)).sum()) > 0  # stats moved
    assert float(np.abs(np.asarray(bn.var.value) - 1.0).sum()) > 0

    # eval uses running stats: two evaluates agree (no stat updates in eval)
    r1 = m.evaluate(ds, batch_size=32)
    mean_after = np.asarray(bn.mean.value).copy()
    r2 = m.evaluate(ds, batch_size=32)
    np.testing.assert_array_equal(mean_after, np.asarray(bn.mean.value))
    assert abs(r1["loss"] - r2["loss"]) < 1e-6


def test_batch_norm_unit_normalizes_batch():
    import numpy as np

    from models_tpu.blocks.mlp import BatchNorm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((256, 4)) * 5.0 + 3.0, jnp.float32)
    bn = BatchNorm()
    out = np.asarray(bn(x, training=True))
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.std(axis=0), 1.0, atol=1e-2)


def test_dense_residual_batch_norm_trains():
    """Regression: DenseResidualBlock's BatchNorm must receive context so its
    running-stat updates flow through the functional protocol (was a
    TraceContextError crash in compiled training)."""
    import numpy as np

    from models_tpu.blocks.mlp import DenseResidualBlock
    from models_tpu.core.combinators import SequentialBlock
    from models_tpu.data import generate_data
    from models_tpu.inputs import InputBlockV2
    from models_tpu.models import Model
    from models_tpu.outputs import BinaryOutput

    ds = generate_data("e-commerce", num_rows=96)
    body = SequentialBlock([InputBlockV2(ds.schema, dim=8), DenseResidualBlock()])
    m = Model(body, BinaryOutput("click"), schema=ds.schema)
    m.compile()
    h = m.fit(ds, epochs=1, batch_size=32, verbose=0)
    assert np.isfinite(h.history["loss"][0])


def test_deepcopied_batch_norms_get_distinct_state_slots():
    """Regression: deepcopy (expert stacking / repeat) duplicates constructor
    state keys; the engine must re-key so EVERY copy's running stats update."""
    import numpy as np

    from models_tpu.blocks.mlp import BatchNorm, MLPBlock
    from models_tpu.core.block import iter_blocks
    from models_tpu.core.combinators import SequentialBlock
    from models_tpu.data import generate_data
    from models_tpu.inputs import InputBlockV2
    from models_tpu.models import MMOEModel

    ds = generate_data("e-commerce", num_rows=96)
    m = MMOEModel(
        ds.schema,
        expert_block=MLPBlock([8], normalization="batch_norm"),
        num_experts=3,
        embedding_dim=8,
    )
    m.compile()
    m.fit(ds, epochs=1, batch_size=32, verbose=0)
    bns = [b for b in iter_blocks(m) if isinstance(b, BatchNorm)]
    assert len(bns) == 3
    assert len({bn._state_key for bn in bns}) == 3  # re-keyed unique
    for bn in bns:
        assert float(np.abs(np.asarray(bn.mean.value)).sum()) > 0, "stats frozen"


# ---------------------------------------------------------------------------
# ParallelBlock selection / pruning (reference tests/unit/tf/core/test_combinators.py)
# ---------------------------------------------------------------------------

def test_parallel_select_by_tag_picks_matching_branches():
    from models_tpu.blocks.mlp import MLPBlock
    from models_tpu.core.combinators import ParallelBlock
    from models_tpu.data import generate_data
    from models_tpu.schema import Tags

    ds = generate_data("e-commerce", num_rows=32)
    user_schema = ds.schema.select_by_tag(Tags.USER)
    item_schema = ds.schema.select_by_tag(Tags.ITEM)
    ua = MLPBlock([4], block_name="user_tower")
    ua.schema = user_schema
    ib = MLPBlock([4], block_name="item_tower")
    ib.schema = item_schema
    pb = ParallelBlock({"user": ua, "item": ib})
    sel = pb.select_by_tag(Tags.USER)
    assert sel is not None and set(sel.branches.keys()) == {"user"}
    sel_i = pb.select_by_tag(Tags.ITEM_ID)
    assert sel_i is not None and set(sel_i.branches.keys()) == {"item"}
    assert pb.select_by_tag(Tags.SESSION) is None
    # branch lookup by key through select_by_name
    assert pb.select_by_name("user") is ua


def test_parallel_branch_schema_filtering_routes_columns():
    import jax.numpy as jnp

    from models_tpu.core.block import Lambda
    from models_tpu.core.combinators import ParallelBlock
    from models_tpu.schema import Schema, create_continuous_column

    from models_tpu.core.block import Block

    seen = {}

    class Probe(Block):
        def __init__(self, name, schema):
            super().__init__(schema=schema, block_name=name)

        def __call__(self, x, **kw):
            seen[self.block_name] = sorted(x.keys())
            return jnp.zeros(1)

    sa = Schema([create_continuous_column("a")])
    sb = Schema([create_continuous_column("b")])
    pb = ParallelBlock({"pa": Probe("pa", sa), "pb": Probe("pb", sb)})
    pb({"a": jnp.ones(2), "b": jnp.ones(2), "c": jnp.ones(2)})
    assert seen["pa"] == ["a"]
    assert seen["pb"] == ["b"]


def test_select_by_name_through_parallel():
    from models_tpu.blocks.mlp import MLPBlock
    from models_tpu.core.combinators import ParallelBlock, SequentialBlock

    tower_a = MLPBlock([4], block_name="tower_a")
    tower_b = MLPBlock([8], block_name="tower_b")
    pb = ParallelBlock({"a": tower_a, "b": tower_b}, block_name="two_towers")
    seq = SequentialBlock([pb], block_name="outer")
    assert seq.select_by_name("outer") is seq
    assert seq.select_by_name("tower_b") is tower_b
    assert seq.select_by_name("nope") is None


def test_encoder_refuses_fit():
    from models_tpu.core.encoder import EmbeddingEncoder
    from models_tpu.inputs import EmbeddingTable
    from models_tpu.schema import Tags, create_categorical_column

    t = EmbeddingTable(4, create_categorical_column("item_id", 10, tags=(Tags.ITEM_ID,)))
    enc = EmbeddingEncoder(t)
    with pytest.raises((NotImplementedError, RuntimeError, ValueError)):
        enc.fit(None)


def test_encoder_encode_sweep_and_batch_predict():
    """Encoder.encode runs a jitted batched sweep over a dataset and returns
    per-row embeddings aligned with an index column (the Dask map_partitions
    analog, reference tf/core/encoder.py:86)."""
    import numpy as np

    from models_tpu.core.encoder import EmbeddingEncoder
    from models_tpu.data import Dataset, generate_data
    from models_tpu.inputs import EmbeddingTable
    from models_tpu.schema import Tags, create_categorical_column

    ds = generate_data("movielens-100k", num_rows=64)
    item_col = ds.schema["movieId"]
    t = EmbeddingTable(8, item_col)
    enc = EmbeddingEncoder(t)
    out = enc.encode(ds, index="movieId", batch_size=16)
    assert out.num_rows == 64
    cols = out.to_numpy_dict()
    assert "id" in cols  # the index column
    emb = (
        cols["embedding__values"].reshape(64, -1)
        if "embedding__values" in cols
        else cols["embedding"]
    )
    # rows match direct table lookups at the index ids
    direct = t.to_array()[cols["id"]]
    np.testing.assert_allclose(np.asarray(emb, np.float32), direct, rtol=1e-5)


# ---------------------------------------------------------------------------
# Aggregation registry (reference tests/unit/tf/core/test_aggregation.py)
# ---------------------------------------------------------------------------

def test_elementwise_sum_and_multiply_exact():
    from models_tpu.core.aggregation import ElementwiseMultiply, ElementwiseSum

    a = jnp.asarray([[1.0, 2.0]])
    b = jnp.asarray([[10.0, 20.0]])
    np.testing.assert_allclose(np.asarray(ElementwiseSum()({"a": a, "b": b})), [[11.0, 22.0]])
    np.testing.assert_allclose(
        np.asarray(ElementwiseMultiply()({"a": a, "b": b})), [[10.0, 40.0]]
    )


def test_elementwise_sum_shape_mismatch_raises():
    from models_tpu.core.aggregation import ElementwiseSum

    with pytest.raises(Exception):
        np.asarray(ElementwiseSum()({"a": jnp.ones((2, 3)), "b": jnp.ones((2, 5))}))


def test_element_wise_sum_item_multi_broadcasts_context():
    from models_tpu.core.aggregation import ElementwiseSumItemMulti
    from models_tpu.core.types import SequenceFeature

    item = SequenceFeature(jnp.ones((2, 4, 3)), jnp.ones((2, 4), bool))
    ctx1 = jnp.full((2, 3), 2.0)
    ctx2 = jnp.full((2, 3), 3.0)
    out = np.asarray(
        ElementwiseSumItemMulti()({"item": item, "c1": ctx1, "c2": ctx2})
    )
    assert out.shape == (2, 4, 3)
    np.testing.assert_allclose(out, 1.0 + 5.0)  # item + sum(context) broadcast over L

    with pytest.raises(ValueError, match="exactly one 3-D"):
        ElementwiseSumItemMulti()({"c1": ctx1})


def test_cosine_aggregation_bounds_and_arity():
    from models_tpu.core.aggregation import CosineSimilarity

    a = jnp.asarray([[1.0, 0.0], [1.0, 1.0]])
    b = jnp.asarray([[1.0, 0.0], [-1.0, -1.0]])
    out = np.asarray(CosineSimilarity()({"a": a, "b": b}))
    np.testing.assert_allclose(out[:, 0], [1.0, -1.0], atol=1e-6)
    with pytest.raises(ValueError, match="exactly 2"):
        CosineSimilarity()({"a": a})


def test_stack_aggregation_axis():
    from models_tpu.core.aggregation import StackFeatures

    a, b = jnp.ones((2, 4)), 2 * jnp.ones((2, 4))
    out = np.asarray(StackFeatures()({"a": a, "b": b}))
    assert out.shape == (2, 2, 4)
    np.testing.assert_allclose(out[:, 0], 1.0)  # sorted keys: 'a' first
    np.testing.assert_allclose(out[:, 1], 2.0)


def test_sum_residual_aggregation():
    from models_tpu.core.aggregation import SumResidual

    a = jnp.asarray([[1.0, 2.0]])
    b = jnp.asarray([[10.0, 10.0]])
    out = np.asarray(SumResidual()({"a": a, "shortcut": b}))
    assert out.shape == (1, 2)


def test_sequence_min_and_masked_positions():
    from models_tpu.core.aggregation import sequence_max, sequence_min
    from models_tpu.core.types import SequenceFeature

    vals = jnp.asarray([[[5.0], [-7.0], [100.0]]])
    mask = jnp.asarray([[True, True, False]])
    sf = SequenceFeature(vals, mask)
    np.testing.assert_allclose(np.asarray(sequence_min(sf)), [[-7.0]])
    np.testing.assert_allclose(np.asarray(sequence_max(sf)), [[5.0]])


def test_aggregation_registry_names_complete():
    """Every aggregation name the reference registers resolves here."""
    from models_tpu.core.aggregation import TabularAggregation

    for name in (
        "concat", "stack", "sum", "element-wise-sum", "sum-residual",
        "element-wise-sum-item-multi", "cosine", "element-wise-multiply",
        "masked_mean", "sequence-mean", "sequence-sum", "sequence-max",
        "sequence-min", "sequence-last",
    ):
        assert TabularAggregation.parse(name) is not None, name


# ---------------------------------------------------------------------------
# Core utilities: Filter modes, call_block kwarg filtering, registry, Lambda
# ---------------------------------------------------------------------------

def test_filter_by_names_exclude_mode():
    from models_tpu.core.combinators import Filter

    x = {"a": jnp.ones(2), "b": jnp.ones(2), "c": jnp.ones(2)}
    keep = Filter(["a", "b"])(x)
    assert set(keep) == {"a", "b"}
    drop = Filter(["a", "b"], exclude=True)(x)
    assert set(drop) == {"c"}
    single = Filter("a")(x)
    assert set(single) == {"a"}
    # non-dict input passes through
    arr = jnp.ones(3)
    assert Filter(["a"])(arr) is arr


def test_call_block_filters_kwargs():
    from models_tpu.core.block import call_block

    seen = {}

    def narrow(x, *, training=False):
        seen["training"] = training
        return x

    out = call_block(narrow, jnp.ones(2), training=True, context="CTX", targets=None)
    assert seen["training"] is True  # context/targets silently dropped

    def wide(x, **kwargs):
        seen["kwargs"] = set(kwargs)
        return x

    call_block(wide, jnp.ones(2), training=True, context="CTX")
    assert seen["kwargs"] == {"training", "context"}


def test_registry_aliases_and_errors():
    from models_tpu.registry import aggregation_registry

    with pytest.raises(Exception) as e:
        aggregation_registry.parse("definitely_not_registered")
    assert "definitely_not_registered" in str(e.value)
    # alias: "sum" and "element-wise-sum" resolve to the same class
    a = aggregation_registry.parse("sum")
    b = aggregation_registry.parse("element-wise-sum")
    assert type(a) is type(b)


def test_lambda_and_noop_and_debug():
    from models_tpu.core.block import Debug, Lambda, NoOp

    x = jnp.arange(4.0)
    assert NoOp()(x) is x
    assert Debug()(x) is x
    double = Lambda(lambda v: v * 2)
    np.testing.assert_allclose(np.asarray(double(x)), np.asarray(x) * 2)


def test_examples_per_second_callback_math():
    from models_tpu.utils.callbacks import ExamplesPerSecondCallback

    logs = []
    cb = ExamplesPerSecondCallback(batch_size=100, every_n_steps=2, log_fn=logs.append)
    cb.on_epoch_begin(0)
    for step in range(4):
        cb.on_batch_end(step, {})
    assert cb.history  # recorded throughput entries
    assert all(v > 0 for v in cb.history)


def test_wandb_logger_noop_without_wandb():
    from models_tpu.utils.callbacks import WandbLogger

    cb = WandbLogger(project="x")
    cb.set_model(object())
    cb.on_epoch_end(0, {"loss": 1.0})
    cb.finish()  # must not raise without wandb installed


def test_reference_namespace_coverage():
    """Every meaningful public symbol of the reference's tf namespace resolves
    here (by name) — TF/Keras internals excepted. A user porting `import
    merlin.models.tf as mm` code should find every name."""
    import re

    import models_tpu as mm

    ref_init = "/root/reference/merlin/models/tf/__init__.py"
    if not __import__("os").path.exists(ref_init):
        pytest.skip("reference absent")
    src = open(ref_init).read()
    names = set()
    for m in re.finditer(r"from [\w\.]+ import \(?([^)]+?)\)?\n(?=\S)", src, re.S):
        for part in re.split(r"[,\n]", m.group(1)):
            part = part.strip()
            if " as " in part:
                part = part.split(" as ")[-1].strip()
            if part and part.isidentifier():
                names.add(part)
    # TF/Keras internals with no meaning on this stack
    NA = {
        "Layer", "Loss", "LossType", "Optimizer", "ListWrapper", "_DictWrapper",
        "KerasSequenceValidator", "configure_tensorflow", "repr_utils",
        "benchmark", "OptimizerBlocks",
    }
    missing = sorted(n for n in names - NA if not hasattr(mm, n))
    assert not missing, f"reference symbols without an equivalent: {missing}"


def test_compat_shims_behave():
    import jax.numpy as jnp

    import models_tpu as mm
    from models_tpu.core.types import SequenceFeature

    # TensorInitializer round-trips through EmbeddingTable
    w = np.arange(20, dtype=np.float32).reshape(5, 4)
    t = mm.EmbeddingTable(4, mm.create_categorical_column("x", 4),
                          initializer=mm.TensorInitializer(w))
    np.testing.assert_allclose(t.to_array(), w)

    # ToDense strips masks; ToSparse is identity
    sf = SequenceFeature(jnp.ones((2, 3)), jnp.ones((2, 3), bool))
    assert isinstance(mm.ToDense()({"s": sf})["s"], jnp.ndarray)
    assert mm.ToSparse()(sf) is sf
    out = mm.ToOneHot(5)(jnp.array([1, 3]))
    assert out.shape == (2, 5)

    # EmbeddingOptions → Embeddings kwargs
    opts = mm.EmbeddingOptions(embedding_dim_default=16)
    emb = mm.Embeddings(
        mm.Schema([mm.create_categorical_column("a", 10)]), **opts.to_kwargs()
    )
    assert emb["a"].dim == 16

    # SequenceAggregator resolves registry entries (dict-in like all aggregations)
    agg = mm.SequenceAggregator("mean")
    out = agg({"s": SequenceFeature(jnp.ones((1, 2, 4)), jnp.ones((1, 2), bool))})
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_embedding_options_partial_dict_uses_default():
    """Reference semantics: unlisted columns get embedding_dim_default, not
    cardinality inference (embedding.py:1057)."""
    import models_tpu as mm

    schema = mm.Schema(
        [mm.create_categorical_column("a", 10), mm.create_categorical_column("b", 1000)]
    )
    opts = mm.EmbeddingOptions(embedding_dims={"a": 32}, embedding_dim_default=64)
    emb = mm.Embeddings(schema, **opts.to_kwargs())
    assert emb["a"].dim == 32
    assert emb["b"].dim == 64  # default, not inferred


def test_right_shift_layer_with_selection():
    import models_tpu as mm
    from models_tpu.core.combinators import Filter

    seen = {}
    probe = mm.Lambda(lambda d: seen.update(d) or jnp.ones(1), block_name="probe")
    blk = mm.right_shift_layer(probe, ["a"])
    assert isinstance(blk.layers[0], Filter)
    blk({"a": jnp.ones((2, 3)), "b": jnp.ones((2, 5))})
    assert set(seen) == {"a"}  # selection applied before the right block


def test_tensor_initializer_shape_errors():
    import models_tpu as mm

    init = mm.TensorInitializer(np.ones((10, 4)))
    with pytest.raises(ValueError, match="does not match"):
        init(None, (10, 8))  # wrong dim
    with pytest.raises(ValueError, match="does not match"):
        init(None, (8, 4))  # fewer rows than the value
    with pytest.raises(ValueError, match="does not match"):
        init(None, (64, 4))  # padding gap >= 8 means a real mismatch
    out = init(None, (16, 4))  # legitimate multiple-of-8 padding
    assert out.shape == (16, 4)


def test_bucket_padding_multihost_agrees_across_ranks():
    """pad='bucket' under multi-host sharding: all ranks must compile the SAME
    per-step bucket shapes (agreed via the shared shuffle seed), and together
    cover the data the single-host loader would yield."""
    from models_tpu.data import Loader, generate_data

    ds = generate_data("sequence-testing", num_rows=64)
    loaders = [
        Loader(ds, batch_size=8, pad="bucket", shuffle=True, seed=3,
               global_size=2, global_rank=r, drop_last=True)
        for r in (0, 1)
    ]
    batches = [list(l) for l in loaders]
    assert len(batches[0]) == len(batches[1]) == 4
    for (x0, _), (x1, _) in zip(*batches):
        # identical padded shape per step on every rank (SPMD requirement)
        assert x0["item_id_seq"].values.shape == x1["item_id_seq"].values.shape
        # bucket engaged: power-of-two width <= schema max
        L = x0["item_id_seq"].values.shape[1]
        assert L & (L - 1) == 0
    # the global bucket is the max over BOTH ranks' rows for that step
    for (x0, _), (x1, _) in zip(*batches):
        longest = max(
            int(x0["item_id_seq"].mask.sum(axis=1).max()),
            int(x1["item_id_seq"].mask.sum(axis=1).max()),
        )
        L = x0["item_id_seq"].values.shape[1]
        assert L >= longest and L < 2 * max(longest, 1) + 1


def test_fluent_graph_building():
    """connect / connect_branch / connect_with_residual / connect_with_shortcut /
    repeat_in_parallel (reference Block fluent API, tf/core/base.py)."""
    from models_tpu.blocks.mlp import Dense, MLPBlock

    x = jnp.ones((2, 6))

    seq = Dense(4, seed=1).connect(Dense(3, seed=2))
    assert seq(x).shape == (2, 3)

    branched = Dense(4, seed=1).connect_branch(
        Dense(2, seed=3), Dense(5, seed=4), aggregation="concat"
    )
    assert branched(x).shape == (2, 7)

    res = MLPBlock([6], seed=5).connect_with_residual(Dense(6, seed=6))
    assert res(x).shape == (2, 6)

    short = Dense(4, seed=7).connect_with_shortcut(Dense(4, seed=8))
    assert short(x).shape[0] == 2

    par = Dense(4, seed=9).repeat_in_parallel(3, aggregation="concat")
    out = par(x)
    assert out.shape == (2, 12)
    # copies are independently initialized post-build (fresh Dense builds lazily
    # per branch; here the template was unbuilt so each branch builds its own)
    cols = np.asarray(out).reshape(2, 3, 4)
    assert not np.allclose(cols[:, 0], cols[:, 1])
