"""Behavioral coverage for exported symbols that no other test names directly.

Two kinds of assertion:
- alias identity: every V1/V2 compat alias must BE its canonical (tested)
  implementation, so namespace parity can't silently point at a stub;
- micro-behaviors: genuinely distinct small blocks (AsTabular, WithShortcut,
  Dropout, experts gates, sequence-mask inference transforms, metrics) are
  driven with tiny tensors and checked against hand-computed results.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import models_tpu as mm


# ---------------------------------------------------------------------------
# alias identity
# ---------------------------------------------------------------------------

ALIASES = [
    # (alias, canonical)
    ("BinaryClassificationTask", "BinaryOutput"),
    ("MultiClassClassificationTask", "CategoricalOutput"),
    ("RegressionTask", "RegressionOutput"),
    ("ItemRetrievalTask", "ContrastiveOutput"),
    ("InBatchSamplerV2", "InBatchSampler"),
    ("PopularityBasedSamplerV2", "PopularityBasedSampler"),
    ("ItemSampler", "CandidateSampler"),
    ("IndexBlock", "BruteForce"),
    ("TopKIndexBlock", "BruteForce"),
    ("TabularBlock", "ParallelBlock"),
    ("TwoTowerModelV2", "TwoTowerModel"),
    ("MatrixFactorizationModelV2", "MatrixFactorizationModel"),
    ("YoutubeDNNRetrievalModelV2", "YoutubeDNNRetrievalModel"),
    ("LogLossMetric", "LogLoss"),
    ("ContinuousFeatures", "Continuous"),
    ("PrepareListFeatures", "PrepareFeatures"),
]


def test_alias_identity():
    for alias, canonical in ALIASES:
        assert getattr(mm, alias) is getattr(mm, canonical), (alias, canonical)


# ---------------------------------------------------------------------------
# tiny combinators
# ---------------------------------------------------------------------------

def test_as_tabular_wraps_tensor():
    x = jnp.ones((2, 3))
    out = mm.AsTabular("feat")(x)
    assert set(out) == {"feat"} and out["feat"] is x


def test_with_shortcut_branches_and_aggregates():
    from models_tpu.blocks.mlp import Dense

    x = jnp.ones((2, 4))
    block = Dense(4, use_bias=False, seed=0)
    ws = mm.WithShortcut(block, shortcut_name="skip", block_name_out="proj")
    out = ws(x)
    assert set(out) == {"proj", "skip"}
    np.testing.assert_allclose(np.asarray(out["skip"]), np.asarray(x))
    np.testing.assert_allclose(np.asarray(out["proj"]), np.asarray(block(x)), rtol=1e-6)
    # concat aggregation collapses the dict
    agg = mm.WithShortcut(block, aggregation="concat")(x)
    assert agg.shape == (2, 8)


def test_dropout_stateless_and_step_keyed():
    from models_tpu.core.types import ModelContext

    d = mm.Dropout(0.5, seed=1)
    x = jnp.ones((4, 64))
    # eval = identity
    np.testing.assert_allclose(np.asarray(d(x, training=False)), np.asarray(x))
    ctx0 = ModelContext({"step": 0})
    ctx1 = ModelContext({"step": 1})
    y0a = np.asarray(d(x, training=True, context=ctx0))
    y0b = np.asarray(d(x, training=True, context=ModelContext({"step": 0})))
    y1 = np.asarray(d(x, training=True, context=ctx1))
    np.testing.assert_allclose(y0a, y0b)  # same step → same mask (pure)
    assert (y0a != y1).any()  # different step → different mask
    # kept units are inverse-scaled
    kept = y0a[y0a != 0]
    np.testing.assert_allclose(kept, 2.0)


def test_logits_temperature_scaler():
    s = mm.LogitsTemperatureScaler(0.5)
    np.testing.assert_allclose(np.asarray(s(jnp.asarray([1.0, -2.0]))), [2.0, -4.0])


# ---------------------------------------------------------------------------
# experts
# ---------------------------------------------------------------------------

def test_experts_gate_is_convex_mix():
    gate = mm.ExpertsGate(num_experts=3, seed=0)
    B, D = 4, 5
    rng = np.random.default_rng(0)
    gate_in = jnp.asarray(rng.standard_normal((B, 8)), jnp.float32)
    experts = jnp.asarray(rng.standard_normal((B, 3, D)), jnp.float32)
    out = np.asarray(gate((gate_in, experts)))
    assert out.shape == (B, D)
    # convexity: each output coordinate lies within the experts' min/max
    lo = np.asarray(experts).min(axis=1) - 1e-5
    hi = np.asarray(experts).max(axis=1) + 1e-5
    assert (out >= lo).all() and (out <= hi).all()


def test_ple_block_forward_and_task_separation():
    from models_tpu.blocks.mlp import MLPBlock

    ple = mm.PLEBlock(
        ["click", "buy"], MLPBlock([8], seed=3), num_layers=2,
        num_task_experts=1, num_shared_experts=1, seed=7,
    )
    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 6)), jnp.float32)
    out = ple(x)
    assert set(out) == {"click", "buy"}
    assert out["click"].shape == (4, 8)
    # per-task expert paths must differ (symmetry-broken init)
    assert not np.allclose(np.asarray(out["click"]), np.asarray(out["buy"]))


# ---------------------------------------------------------------------------
# retrieval building blocks
# ---------------------------------------------------------------------------

def test_dual_encoder_block_names_branches():
    from models_tpu.blocks.mlp import Dense

    q, c = Dense(4, seed=0), Dense(4, seed=1)
    block = mm.DualEncoderBlock(q, c)
    x = jnp.ones((2, 4))
    out = block(x)
    assert set(out) == {"query", "candidate"}
    assert not np.allclose(np.asarray(out["query"]), np.asarray(out["candidate"]))


def test_query_item_ids_embeddings_block():
    from models_tpu.schema import Schema, Tags, create_categorical_column

    schema = Schema([
        create_categorical_column("user_id", 10, tags=(Tags.USER, Tags.USER_ID)),
        create_categorical_column("item_id", 20, tags=(Tags.ITEM, Tags.ITEM_ID)),
    ])
    block = mm.QueryItemIdsEmbeddingsBlock(schema, dim=6)
    feats = {"user_id": jnp.asarray([1, 2]), "item_id": jnp.asarray([3, 4])}
    out = block(feats)
    assert set(out) == {"query", "candidate"}
    assert out["query"].shape == (2, 6) and out["candidate"].shape == (2, 6)


def test_model_block_trains_any_block():
    """ModelBlock: arbitrary block + head → trainable model (reference :185)."""
    from models_tpu.blocks.mlp import MLPBlock
    from models_tpu.outputs import BinaryOutput

    ds = mm.generate_data("e-commerce", num_rows=120)
    model = mm.ModelBlock(
        mm.InputBlockV2(ds.schema), MLPBlock([8], seed=0), BinaryOutput("click"),
        schema=ds.schema,
    )
    model.compile(optimizer="adam")
    h = model.fit(ds, epochs=1, batch_size=40, verbose=0)
    assert np.isfinite(h.history["loss"][0])


# ---------------------------------------------------------------------------
# sequence transforms (inference-side)
# ---------------------------------------------------------------------------

def _session_inputs(B=3, L=5, card=50, seed=0):
    rng = np.random.default_rng(seed)
    vals = rng.integers(1, card, (B, L))
    lens = np.array([5, 3, 4])
    mask = np.arange(L)[None, :] < lens[:, None]
    vals = vals * mask
    from models_tpu.core.types import SequenceFeature

    return SequenceFeature(jnp.asarray(vals), jnp.asarray(mask))


def _session_schema(card=50, L=5):
    from models_tpu.schema import Schema, Tags, create_categorical_column

    return Schema([
        create_categorical_column(
            "item_id", card, tags=(Tags.ITEM_ID, Tags.SEQUENCE),
            is_list=True, max_seq_length=L,
        )
    ])


def test_sequence_target_as_input():
    from models_tpu.core.types import ModelContext, SequenceFeature

    seq = _session_inputs()
    t = mm.SequenceTargetAsInput(_session_schema(), target="item_id")
    ctx = ModelContext()
    new_inputs, new_targets = t({"item_id": seq}, context=ctx)
    tgt = new_targets["item_id"]
    assert isinstance(tgt, SequenceFeature)
    np.testing.assert_array_equal(np.asarray(tgt.values), np.asarray(seq.values))
    np.testing.assert_array_equal(np.asarray(tgt.mask), np.asarray(seq.mask))
    # the input sequence is untouched (masking transform comes separately)
    np.testing.assert_array_equal(
        np.asarray(new_inputs["item_id"].values), np.asarray(seq.values)
    )


def test_sequence_mask_last_inference_marks_last_position():
    from models_tpu.core.types import MASK_KEY, ModelContext

    seq = _session_inputs()
    t = mm.SequenceMaskLastInference(_session_schema(), target="item_id")
    ctx = ModelContext()
    t({"item_id": seq}, context=ctx, training=False)
    pm = np.asarray(ctx[MASK_KEY])
    # exactly one predicted position per row: the LAST valid one
    assert pm.sum(axis=1).tolist() == [1, 1, 1]
    np.testing.assert_array_equal(np.argmax(pm, axis=1), [4, 2, 3])


def test_extract_mask_from_targets():
    from models_tpu.core.types import MASK_KEY, ModelContext

    seq = _session_inputs()
    ctx = ModelContext()
    mm.ExtractMaskFromTargets()(None, targets={"item_id": seq}, context=ctx)
    np.testing.assert_array_equal(np.asarray(ctx[MASK_KEY]), np.asarray(seq.mask))


# ---------------------------------------------------------------------------
# transformer output adapters
# ---------------------------------------------------------------------------

def test_transformer_inference_hidden_state():
    from models_tpu.core.types import SequenceFeature

    seq = _session_inputs()
    hidden = SequenceFeature(
        jnp.asarray(np.random.default_rng(2).standard_normal((3, 5, 4)), jnp.float32),
        seq.mask,
    )
    adapter = mm.TransformerInferenceHiddenState()
    # training: passthrough
    assert adapter(hidden, training=True) is hidden
    # inference: (B, D) at each row's last valid position
    out = np.asarray(adapter(hidden, training=False))
    assert out.shape == (3, 4)
    np.testing.assert_allclose(out[0], np.asarray(hidden.values)[0, 4])
    np.testing.assert_allclose(out[1], np.asarray(hidden.values)[1, 2])
    assert np.asarray(mm.LastHiddenState()(hidden).values).shape == (3, 5, 4)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def test_streaming_metric_values():
    probs = jnp.asarray([0.9, 0.2, 0.7, 0.4])
    labels = jnp.asarray([1.0, 0.0, 0.0, 1.0])

    m = mm.BinaryAccuracy()
    s = m.update(m.init_state(), probs, labels)
    np.testing.assert_allclose(float(m.result(s)), 0.5)

    # head metrics take LOGITS (sigmoid applied internally) — same contract as
    # Precision/Recall/AUC in metrics/base.py
    m = mm.LogLoss()
    s = m.update(m.init_state(), probs, labels)
    p = 1.0 / (1.0 + np.exp(-np.asarray(probs)))
    want = -np.mean(
        np.asarray(labels) * np.log(p) + (1 - np.asarray(labels)) * np.log(1 - p)
    )
    np.testing.assert_allclose(float(m.result(s)), want, rtol=1e-5)

    m = mm.MAE()
    s = m.update(m.init_state(), probs, labels)
    np.testing.assert_allclose(
        float(m.result(s)), np.abs(np.asarray(probs) - np.asarray(labels)).mean(), rtol=1e-5
    )

    m = mm.RMSE()
    s = m.update(m.init_state(), probs, labels)
    want = np.sqrt(np.square(np.asarray(probs) - np.asarray(labels)).mean())
    np.testing.assert_allclose(float(m.result(s)), want, rtol=1e-5)

    # streaming: two partial updates == one combined update
    m = mm.MAE()
    s = m.update(m.init_state(), probs[:2], labels[:2])
    s = m.update(s, probs[2:], labels[2:])
    np.testing.assert_allclose(
        float(m.result(s)), np.abs(np.asarray(probs) - np.asarray(labels)).mean(), rtol=1e-5
    )


def test_bruteforce_bf16_index_exact_vs_naive():
    """index(dtype=bf16): serving agrees exactly with naive top-k over the
    SAME quantized rows, and the recall hit vs an fp32 index is negligible on
    well-separated embeddings (the vector-DB half-width trade)."""
    import jax.numpy as jnp
    import numpy as np

    from models_tpu.outputs.topk import BruteForce

    rng = np.random.default_rng(0)
    C = rng.standard_normal((5000, 32)).astype(np.float32)
    Q = rng.standard_normal((64, 32)).astype(np.float32)

    bf = BruteForce(k=10)
    bf.index(C, dtype=jnp.bfloat16)
    assert bf.candidates.value.dtype == jnp.bfloat16
    pred = bf(jnp.asarray(Q))

    ref_scores = Q @ np.asarray(C.astype(jnp.bfloat16), np.float32).T
    want_ids = np.argsort(-ref_scores, axis=1)[:, :10]
    np.testing.assert_array_equal(np.asarray(pred.identifiers), want_ids)

    bf32 = BruteForce(k=10)
    bf32.index(C)
    ids32 = np.asarray(bf32(jnp.asarray(Q)).identifiers)
    overlap = np.mean([
        len(set(a) & set(b)) / 10.0 for a, b in zip(np.asarray(pred.identifiers), ids32)
    ])
    assert overlap >= 0.95, overlap


def test_index_from_dataset_fallback_excludes_id_column():
    """Regression (review): with vector columns and no 'id'/'embedding' key,
    the first column provides the ids and must NOT also be stacked into the
    embedding matrix (raw id magnitudes would distort every score)."""
    from models_tpu.outputs.topk import BruteForce

    n = 6
    ids = np.arange(100, 100 + n).astype(np.int64)  # big values, would dominate
    f0 = np.linspace(0, 1, n).astype(np.float32)
    f1 = np.linspace(1, 0, n).astype(np.float32)
    bf = BruteForce(k=3)
    bf.index_from_dataset({"item_id": ids, "f0": f0, "f1": f1})
    # index() zero-pads rows to a bin multiple (r5); the real count and the
    # feature width are what matter here
    assert bf.num_candidates == n
    assert bf.candidates.shape[1] == 2
    # query along (1, 0): best candidates are the largest f0 rows, ids 104/105
    scores, got_ids = bf(jnp.asarray([[1.0, 0.0]]))
    assert int(got_ids[0, 0]) == 105 and int(got_ids[0, 1]) == 104
