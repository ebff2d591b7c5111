import jax.numpy as jnp
import numpy as np
import pytest

from models_tpu.blocks import (
    CrossBlock,
    DotProductInteraction,
    FMPairwiseInteraction,
    MLPBlock,
)
from models_tpu.data import Loader, generate_data
from models_tpu.models import (
    DCNModel,
    DeepFMModel,
    DLRMModel,
    MMOEModel,
    NCFModel,
    PLEModel,
    WideAndDeepModel,
)
from models_tpu.schema import Tags

from tests.utils import model_test


@pytest.fixture(scope="module")
def ecommerce():
    from models_tpu.data import generate_data

    return generate_data("e-commerce", num_rows=256)


@pytest.fixture(scope="module")
def music():
    from models_tpu.data import generate_data

    return generate_data("music-streaming", num_rows=256)


def test_dot_product_interaction():
    x = jnp.asarray(np.random.randn(4, 3, 8).astype(np.float32))
    out = DotProductInteraction()(x)
    assert out.shape == (4, 3)  # 3*(3-1)/2
    expected01 = jnp.sum(x[:, 0] * x[:, 1], axis=-1)
    np.testing.assert_allclose(out[:, 0], expected01, rtol=1e-5)
    out_self = DotProductInteraction(self_interaction=True)(x)
    assert out_self.shape == (4, 6)


def test_fm_pairwise():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 3, 8)).astype(np.float32))
    out = FMPairwiseInteraction()(x)
    assert out.shape == (4, 8)
    # brute-force pairwise check (atol: sums of near-cancelling products)
    expected = sum(
        x[:, i] * x[:, j] for i in range(3) for j in range(3) if i < j
    )
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_cross_block():
    cb = CrossBlock(depth=2)
    x = jnp.asarray(np.random.randn(4, 8).astype(np.float32))
    out = cb(x)
    assert out.shape == (4, 8)


def test_dlrm_model(ecommerce, tmp_path):
    # e-commerce has two binary targets (click, conversion) -> multi-task heads
    model = DLRMModel(
        ecommerce.schema, embedding_dim=16, bottom_block=(32,), top_block=(32, 16)
    )
    history, reloaded = model_test(model, ecommerce, tmp_path=tmp_path)
    assert any(k.startswith("loss/") for k in history.history)


def test_dlrm_single_task(music, tmp_path):
    schema = music.schema.excluding_by_name(["play_percentage", "like"])
    model = DLRMModel(schema, embedding_dim=16, top_block=(16,))
    history, _ = model_test(model, music)
    res = model.evaluate(music, batch_size=16)
    assert "click/auc" in res
    assert 0.0 <= res["click/auc"] <= 1.0


def test_dcn_model(ecommerce, tmp_path):
    model = DCNModel(ecommerce.schema, depth=2, deep_block=(32, 16), embedding_dim=8)
    model_test(model, ecommerce, tmp_path=tmp_path)


def test_dcn_low_rank_parallel(ecommerce):
    model = DCNModel(
        ecommerce.schema, depth=1, deep_block=(16,), stacked=False, low_rank_dim=4,
        embedding_dim=8,
    )
    model_test(model, ecommerce)


def test_deepfm_model(ecommerce):
    model = DeepFMModel(ecommerce.schema, embedding_dim=8, deep_block=(16,))
    model_test(model, ecommerce)


def test_wide_and_deep(ecommerce):
    model = WideAndDeepModel(
        ecommerce.schema, embedding_dim=8, deep_block=(16,), enable_wide_crosses=False
    )
    model_test(model, ecommerce)


def test_ncf_model(music):
    schema = music.schema.excluding_by_name(["play_percentage", "like"])
    model = NCFModel(schema, embedding_dim=8, mlp_block=(16,))
    model_test(model, music)


def test_mmoe_model(ecommerce):
    model = MMOEModel(
        ecommerce.schema, expert_block=(16,), num_experts=3, embedding_dim=8
    )
    history, _ = model_test(model, ecommerce)
    res = model.evaluate(ecommerce, batch_size=16)
    # two tasks, each with AUC
    aucs = [k for k in res if k.endswith("auc")]
    assert len(aucs) == 2


def test_ple_model(ecommerce):
    model = PLEModel(
        ecommerce.schema, expert_block=(16,), num_layers=2, embedding_dim=8
    )
    model_test(model, ecommerce)


def test_multitask_loss_weights(ecommerce):
    model = MMOEModel(ecommerce.schema, expert_block=(16,), num_experts=2, embedding_dim=8)
    model.compile(loss_weights={"click/BinaryOutput": 2.0, "conversion/BinaryOutput": 0.5})
    hist = model.fit(ecommerce, epochs=1, batch_size=16, verbose=0)
    assert np.isfinite(hist.history["loss"][0])


def test_regression_head(music):
    schema = music.schema.excluding_by_name(["click", "like"])
    model = DLRMModel(schema, embedding_dim=8, top_block=(16,))
    model.compile()
    model.fit(music, epochs=1, batch_size=16, verbose=0)
    res = model.evaluate(music, batch_size=16)
    assert "play_percentage/rmse" in res


def test_wide_and_deep_with_crosses(ecommerce_data):
    model = WideAndDeepModel(
        ecommerce_data.schema.select_by_name(
            ["user_gender", "user_age", "item_category", "position", "click"]
        ),
        embedding_dim=8,
        deep_block=(16,),
        enable_wide_crosses=True,
    )
    model_test(model, ecommerce_data)


# ---------------------------------------------------------------------------
# Multi-task scenarios (reference tests/unit/tf/outputs/test_block.py and
# prediction_tasks/test_multi_task.py)
# ---------------------------------------------------------------------------

def test_multitask_task_towers(ecommerce):
    """Per-task towers (task_blocks) are attached as head pre and train."""
    model = MMOEModel(
        ecommerce.schema,
        expert_block=(16,),
        num_experts=2,
        embedding_dim=8,
        task_blocks={"click": MLPBlock([12]), "conversion": MLPBlock([6])},
    )
    model.compile()
    hist = model.fit(ecommerce, epochs=1, batch_size=16, verbose=0)
    assert np.isfinite(hist.history["loss"][0])
    # the towers exist and have distinct widths
    from models_tpu.blocks.mlp import Dense
    from models_tpu.core.block import iter_blocks

    widths = sorted(
        b.units for b in iter_blocks(model) if isinstance(b, Dense) and b.units in (12, 6)
    )
    assert widths == [6, 12]


def test_multitask_loss_weights_scale_total_loss(ecommerce):
    """Doubling one task's loss weight must raise the combined loss (same seed)."""
    def loss_with(weights):
        model = MMOEModel(ecommerce.schema, expert_block=(16,), num_experts=2,
                          embedding_dim=8, seed=7)
        model.compile(loss_weights=weights)
        res = model.evaluate(ecommerce, batch_size=64)
        return res["loss"]

    base = loss_with({"click/BinaryOutput": 1.0, "conversion/BinaryOutput": 1.0})
    heavy = loss_with({"click/BinaryOutput": 3.0, "conversion/BinaryOutput": 1.0})
    assert heavy > base


def test_column_based_sample_weight_unit():
    from models_tpu.core.types import ModelContext, Prediction
    from models_tpu.outputs import ColumnBasedSampleWeight

    ctx = ModelContext()
    ctx.features = {"w": jnp.array([0.0, 2.0, 1.0])}
    cw = ColumnBasedSampleWeight("w")
    pred = Prediction(outputs=jnp.zeros((3, 1)), targets=jnp.zeros((3, 1)))
    out = cw(pred, context=ctx)
    np.testing.assert_allclose(np.asarray(out.sample_weight), [0.0, 2.0, 1.0])
    # binary class weights mode
    cw2 = ColumnBasedSampleWeight("w", binary_class_weights=(0.5, 4.0))
    out2 = cw2(pred, context=ctx)
    np.testing.assert_allclose(np.asarray(out2.sample_weight), [0.5, 4.0, 4.0])
    # composes multiplicatively with an existing weight
    pred3 = Prediction(outputs=jnp.zeros((3, 1)), targets=jnp.zeros((3, 1)),
                       sample_weight=jnp.array([1.0, 1.0, 0.0]))
    out3 = cw(pred3, context=ctx)
    np.testing.assert_allclose(np.asarray(out3.sample_weight), [0.0, 2.0, 0.0])
    # missing column raises
    with pytest.raises(ValueError, match="not found"):
        cw(pred, context=ModelContext())


def test_column_based_sample_weight_in_model(ecommerce):
    """Weighting the click task by the conversion column: rows with
    conversion=0 contribute nothing to the click loss."""
    from models_tpu.core.combinators import SequentialBlock
    from models_tpu.inputs import InputBlockV2
    from models_tpu.models import Model
    from models_tpu.outputs import BinaryOutput, ColumnBasedSampleWeight

    schema = ecommerce.schema
    head = BinaryOutput(schema["click"], post=ColumnBasedSampleWeight("user_age"))
    body = SequentialBlock([InputBlockV2(schema, dim=8), MLPBlock([16])])
    model = Model(body, head, schema=schema)
    model.compile()
    hist = model.fit(ecommerce, epochs=1, batch_size=32, verbose=0)
    assert np.isfinite(hist.history["loss"][0])


def test_cgc_block_shapes():
    from models_tpu.blocks.experts import CGCBlock

    block = CGCBlock(["t1", "t2"], (8,), num_task_experts=1, num_shared_experts=2)
    out = block(jnp.ones((4, 12)))
    assert set(out.keys()) >= {"t1", "t2"}
    assert out["t1"].shape == (4, 8)
    # task outputs differ (separate experts/gates)
    assert not np.allclose(np.asarray(out["t1"]), np.asarray(out["t2"]))


def test_mmoe_gates_are_softmax():
    from models_tpu.blocks.experts import MMOEBlock

    block = MMOEBlock(["a", "b"], (8,), num_experts=3)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 12)), jnp.float32)
    out = block(x)
    assert out["a"].shape == (4, 8) and out["b"].shape == (4, 8)
    assert not np.allclose(np.asarray(out["a"]), np.asarray(out["b"]))


def test_multitask_task_towers_save_load(ecommerce, tmp_path):
    """Task towers must survive declarative save/load (pre= captured in config)."""
    from models_tpu.utils.io import load_model

    model = MMOEModel(
        ecommerce.schema, expert_block=(16,), num_experts=2, embedding_dim=8,
        task_blocks={"click": MLPBlock([12]), "conversion": MLPBlock([6])},
    )
    model.compile()
    model.fit(ecommerce, epochs=1, batch_size=32, verbose=0)
    path = str(tmp_path / "mmoe_towers")
    model.save(path)
    import os

    assert os.path.exists(os.path.join(path, "config.json"))  # no pickle fallback
    m2 = load_model(path)
    p1 = model.predict(ecommerce, batch_size=64)["click/BinaryOutput"]
    p2 = m2.predict(ecommerce, batch_size=64)["click/BinaryOutput"]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5)



# ---------------------------------------------------------------------------
# Output-head behaviors (reference tests/unit/tf/outputs/test_classification.py)
# ---------------------------------------------------------------------------

def test_categorical_output_in_model():
    """CategoricalOutput over an int-domain target: logits width = cardinality,
    sparse-CE dispatch, accuracy metric present."""
    import numpy as np

    from models_tpu.core.combinators import SequentialBlock
    from models_tpu.data import Dataset
    from models_tpu.inputs import InputBlockV2
    from models_tpu.models import Model
    from models_tpu.outputs import CategoricalOutput
    from models_tpu.schema import Schema, Tags, create_categorical_column

    rng = np.random.default_rng(0)
    n = 192
    schema = Schema(
        [
            create_categorical_column("f1", 20, tags=(Tags.USER,)),
            create_categorical_column("f2", 30, tags=(Tags.ITEM,)),
            create_categorical_column(
                "label", 7, tags=(Tags.TARGET, Tags.MULTI_CLASS_CLASSIFICATION)
            ),
        ]
    )
    ds = Dataset(
        {
            "f1": rng.integers(0, 21, n),
            "f2": rng.integers(0, 31, n),
            "label": rng.integers(0, 8, n),
        },
        schema=schema,
    )
    from models_tpu.blocks.mlp import MLPBlock

    body = SequentialBlock([InputBlockV2(schema, dim=8), MLPBlock([16])])
    m = Model(body, CategoricalOutput(schema["label"]), schema=schema)
    m.compile()
    h = m.fit(ds, epochs=1, batch_size=32, verbose=0)
    assert np.isfinite(h.history["loss"][0])
    p = m.predict(ds, batch_size=32)
    assert np.asarray(p).shape == (n, 8)  # full class distribution (card 7 + OOV)
    np.testing.assert_allclose(np.asarray(p).sum(axis=1), 1.0, rtol=1e-4)  # softmax


def test_categorical_target_tying_lookup():
    """CategoricalTarget.embedding_lookup = transposed-kernel rows (reference
    classification.py:220) — the weight-tying contract."""
    import jax.numpy as jnp
    import numpy as np

    from models_tpu.outputs.base import CategoricalTarget

    ct = CategoricalTarget(num_classes=12, seed=3)
    x = jnp.ones((2, 6))
    logits = ct(x)  # builds
    assert logits.shape == (2, 12)
    emb = ct.embedding_lookup(jnp.array([0, 5]))
    np.testing.assert_allclose(
        np.asarray(emb), np.asarray(ct.dense.kernel.value.T)[[0, 5]], rtol=1e-6
    )
    assert ct.embeddings.shape == (12, 6)


def test_binary_and_regression_activations():
    import jax.numpy as jnp
    import numpy as np

    from models_tpu.outputs import BinaryOutput, RegressionOutput

    b = BinaryOutput("t")
    logits = jnp.asarray([[0.0], [100.0], [-100.0]])
    act = np.asarray(b.activation(logits))
    np.testing.assert_allclose(act, [0.5, 1.0, 0.0], atol=1e-6)
    r = RegressionOutput("t")
    np.testing.assert_allclose(np.asarray(r.activation(logits)), [0.0, 100.0, -100.0])


def test_logits_temperature_on_binary_head(ecommerce_data):
    """logits_temperature scales head logits before loss/metrics."""
    import numpy as np

    from models_tpu.core.combinators import SequentialBlock
    from models_tpu.blocks.mlp import MLPBlock
    from models_tpu.inputs import InputBlockV2
    from models_tpu.models import Model
    from models_tpu.outputs import BinaryOutput

    def predictions(temp):
        body = SequentialBlock([InputBlockV2(ecommerce_data.schema, dim=8, seed=2),
                                MLPBlock([8], seed=2)])
        m = Model(body, BinaryOutput("click", logits_temperature=temp),
                  schema=ecommerce_data.schema)
        m.compile()
        m.build(ecommerce_data)
        return np.asarray(m.predict(ecommerce_data, batch_size=64))

    p1 = predictions(1.0)
    p2 = predictions(2.0)
    # T=2 halves logits -> predictions closer to 0.5, same ranking
    assert np.abs(p2 - 0.5).mean() < np.abs(p1 - 0.5).mean()
    assert (np.argsort(p1) == np.argsort(p2)).mean() > 0.99


def test_cgc_groups_initialize_differently():
    """Regression: the shared group and every task group must NOT share expert
    initializations (deepcopy symmetry across groups/layers)."""
    from models_tpu.blocks.experts import CGCBlock
    from models_tpu.blocks.mlp import Dense
    from models_tpu.core.block import iter_blocks

    block = CGCBlock(["t1", "t2"], (8,), num_task_experts=1, num_shared_experts=1)
    block(jnp.ones((2, 12)))  # build
    kernels = [
        np.asarray(b.kernel.value)
        for b in iter_blocks(block)
        if isinstance(b, Dense) and b.built and b.kernel.value.shape == (12, 8)
    ]
    assert len(kernels) >= 3  # shared + 2 task groups
    for i in range(len(kernels)):
        for j in range(i + 1, len(kernels)):
            assert not np.allclose(kernels[i], kernels[j]), (i, j)


def test_cross_layer_exact_math():
    """DCN-v2 cross: out = x0 * (W x + b) + x, with x0 threaded through depth
    (reference tf/blocks/cross.py:29)."""
    from models_tpu.blocks.cross import Cross

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((3, 6)), jnp.float32)
    c = Cross(seed=1)
    _, out = c(x0)  # first layer: x = x0
    W = np.asarray(c.dense.u.value) if c.dense.u is not None else None
    # DenseMaybeLowRank full-rank path stores the kernel in `u`
    b = np.asarray(c.dense.bias.value) if c.dense.bias is not None else 0.0
    expect = np.asarray(x0) * (np.asarray(x0) @ W + b) + np.asarray(x0)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)

    # second layer keeps the ORIGINAL x0
    c2 = Cross(seed=2)
    x0_held, out2 = c2((x0, out))
    assert x0_held is x0
    W2 = np.asarray(c2.dense.u.value)
    b2 = np.asarray(c2.dense.bias.value)
    expect2 = np.asarray(x0) * (np.asarray(out) @ W2 + b2) + np.asarray(out)
    np.testing.assert_allclose(np.asarray(out2), expect2, rtol=1e-5)


def test_cross_low_rank_factorization():
    """Low-rank cross: W = U V with rank r — parameter count shrinks, math is
    x0 * (U (V x) + b) + x."""
    from models_tpu.blocks.cross import Cross

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    c = Cross(low_rank_dim=2, seed=3)
    _, out = c(x)
    U = np.asarray(c.dense.u.value)
    V = np.asarray(c.dense.v.value)
    assert V.shape == (8, 2) and U.shape == (2, 8)
    b = np.asarray(c.dense.bias.value)
    expect = np.asarray(x) * ((np.asarray(x) @ V) @ U + b) + np.asarray(x)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)


def test_fm_block_structure():
    """FMBlock = first-order wide term + 0.5((Σv)² − Σv²) pairwise term
    (reference interaction.py:256)."""
    from models_tpu.blocks.interaction import FMPairwiseInteraction

    rng = np.random.default_rng(2)
    emb = jnp.asarray(rng.standard_normal((2, 5, 4)), jnp.float32)  # (B, F, D)
    out = np.asarray(FMPairwiseInteraction()(emb))
    v = np.asarray(emb)
    expect = 0.5 * ((v.sum(1) ** 2) - (v ** 2).sum(1))  # per-dim (B, D), like the reference
    np.testing.assert_allclose(out, expect, rtol=1e-4)


def test_wide_and_deep_learns_crossable_signal():
    """W&D with wide crosses learns an XOR-of-categories rule that the wide
    (linear one-hot) path alone cannot express but the cross features can."""
    from models_tpu.data import Dataset
    from models_tpu.models import WideAndDeepModel
    from models_tpu.schema import Schema, Tags, create_categorical_column, create_continuous_column

    rng = np.random.default_rng(0)
    n = 1024
    a = rng.integers(0, 2, n)
    b = rng.integers(0, 2, n)
    y = (a ^ b).astype(np.int32)  # pure interaction signal
    schema = Schema(
        [
            create_categorical_column("a", 1),
            create_categorical_column("b", 1),
            create_continuous_column("click", tags=(Tags.TARGET,)),
        ]
    )
    ds = Dataset({"a": a, "b": b, "click": y.astype(np.float32)}, schema=schema)
    model = WideAndDeepModel(schema, embedding_dim=4, deep_block=(8,), seed=2)
    model.compile(learning_rate=0.05)
    h = model.fit(ds, epochs=8, batch_size=128, shuffle=False, verbose=0)
    assert h.history["loss"][-1] < 0.45, h.history["loss"]  # XOR learned (BCE << log 2)


def test_ncf_has_gmf_and_mlp_paths(music):
    """NCF = GMF (elementwise product) + MLP tower fused (reference
    benchmark.py:32): two embedding tables per id (one per path)."""
    from models_tpu.core.block import iter_blocks
    from models_tpu.inputs import EmbeddingTable
    from models_tpu.models import NCFModel

    schema = music.schema.excluding_by_name(["play_percentage", "like"])
    m = NCFModel(schema, embedding_dim=8, mlp_block=(16,))
    tables = [b for b in iter_blocks(m) if isinstance(b, EmbeddingTable)]
    assert len(tables) >= 4  # user/item x GMF/MLP


# ---------------------------------------------------------------------------
# V1 PredictionTasks / ParallelPredictionBlock (reference
# tf/prediction_tasks/multi.py:25 + base.py:238)
# ---------------------------------------------------------------------------

def _v1_multitask_model(ecommerce, **kwargs):
    import models_tpu as mm

    body = mm.InputBlockV2(ecommerce.schema) >> MLPBlock([16])
    out = mm.PredictionTasks(ecommerce.schema, **kwargs)
    return mm.Model(body, out, schema=ecommerce.schema), out


def test_prediction_tasks_builds_heads_and_trains(ecommerce):
    import models_tpu as mm

    model, out = _v1_multitask_model(ecommerce)
    assert isinstance(out, mm.ParallelPredictionBlock)
    assert sorted(out.heads) == ["click/BinaryOutput", "conversion/BinaryOutput"]
    model.compile(optimizer="adam", learning_rate=0.01)
    hist = model.fit(ecommerce, epochs=1, batch_size=32, verbose=0)
    assert np.isfinite(hist.history["loss"][0])
    assert "loss/click/BinaryOutput" in hist.history


def test_prediction_tasks_single_tower_cloned_per_task(ecommerce):
    """A single task_blocks layer is CLONED per task: fresh, independent params
    (reference clones via from_config(get_config()), base.py:436)."""
    from flax import nnx
    import jax

    model, out = _v1_multitask_model(ecommerce, task_blocks=MLPBlock([8]))
    model.compile()
    model.fit(ecommerce, epochs=1, batch_size=32, verbose=0)
    heads = [out.heads[k] for k in sorted(out.heads)]
    leaves = [
        [np.asarray(l.astype(jnp.float32)) for l in
         jax.tree_util.tree_leaves(nnx.state(h.pre, nnx.Param))]
        for h in heads
    ]
    assert len(leaves[0]) > 0
    assert not all(np.array_equal(a, b) for a, b in zip(leaves[0], leaves[1]))


def test_prediction_tasks_weight_zero_removes_task_from_total(ecommerce):
    """task_weight_dict keys are bare target names; weight 0 drops that task's
    loss from the total while its per-task log still reports."""
    model, _ = _v1_multitask_model(
        ecommerce, task_weight_dict={"click": 0.0, "conversion": 1.0}
    )
    model.compile()
    hist = model.fit(ecommerce, epochs=1, batch_size=128, verbose=0).history
    assert hist["loss"][0] == pytest.approx(
        hist["loss/conversion/BinaryOutput"][0] + hist["regularization_loss"][0],
        rel=1e-5,
    )
    # the zero-weighted task still logs its own (unweighted) loss
    assert hist["loss/click/BinaryOutput"][0] > 0.0
    # compile(loss_weights=...) overrides the block-declared weights
    model.compile(loss_weights={"click": 1.0, "conversion": 1.0})
    hist2 = model.fit(ecommerce, epochs=1, batch_size=128, verbose=0).history
    assert hist2["loss"][0] == pytest.approx(
        hist2["loss/click/BinaryOutput"][0] + hist2["loss/conversion/BinaryOutput"][0]
        + hist2["regularization_loss"][0], rel=1e-5,
    )


def test_prediction_tasks_bias_block_shifts_every_task(ecommerce):
    """bias_block output (through the Dense(1) bias_logit) is added to every
    task's logits: zeroing the bias projection changes predictions."""
    from flax import nnx

    model, out = _v1_multitask_model(ecommerce, bias_block=MLPBlock([4]))
    model.compile()
    model.fit(ecommerce, epochs=1, batch_size=32, verbose=0)
    preds = model.predict(ecommerce, batch_size=64)
    # force a large constant bias; all task outputs must shift
    bias_dense = out.bias_logit
    bias_dense.bias.value = bias_dense.bias.value + 5.0
    preds2 = model.predict(ecommerce, batch_size=64)
    for k in preds:
        assert not np.allclose(np.asarray(preds[k]), np.asarray(preds2[k]))


def test_prediction_tasks_task_pre_runs_after_tower(ecommerce):
    """task_pre_dict blocks compose after the tower (reference pre_call order:
    task_block -> pre -> task layer)."""
    model, out = _v1_multitask_model(
        ecommerce,
        task_blocks={"click": MLPBlock([8])},
        task_pre_dict={"click": MLPBlock([4])},
    )
    model.compile()
    hist = model.fit(ecommerce, epochs=1, batch_size=32, verbose=0)
    assert np.isfinite(hist.history["loss"][0])
    from models_tpu.blocks.mlp import Dense
    from models_tpu.core.block import iter_blocks

    click_head = out.heads["click/BinaryOutput"]
    widths = [b.units for b in iter_blocks(click_head.pre) if isinstance(b, Dense)]
    assert widths == [8, 4]  # tower first, then pre
