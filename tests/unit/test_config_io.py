"""Declarative (get_config/from_config-style) save/load.

Reference contract: every block reconstructs from config
(``tf/models/base.py:1719-1728``); saving must not require unpickling the
module graph in the loading process."""

import json
import os

import numpy as np
import pytest

import models_tpu as mm
from models_tpu.core.config import from_config, to_config
from models_tpu.data import generate_data


def test_zoo_models_save_declaratively(tmp_path):
    ecom = generate_data("e-commerce", num_rows=64)
    m = mm.DCNModel(ecom.schema, depth=1, deep_block=(8,))
    m.compile()
    m.fit(ecom, epochs=1, batch_size=16, verbose=0)
    p = str(tmp_path / "dcn")
    m.save(p)
    assert os.path.exists(os.path.join(p, "config.json"))
    assert not os.path.exists(os.path.join(p, "model.pkl"))  # no graph pickle
    doc = json.load(open(os.path.join(p, "config.json")))
    assert doc["format"] == "config"
    m2 = mm.load_model(p)
    x, _ = mm.sample_batch(ecom, batch_size=16)
    p1, p2 = m.predict(dict(x)), m2.predict(dict(x))
    import jax

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6),
        p1, p2,
    )


def test_config_roundtrip_preserves_weight_tying():
    testing = generate_data("testing", num_rows=64)
    m = mm.YoutubeDNNRetrievalModel(testing.schema, num_sampled=10, embedding_dim=8)
    m.compile()
    m.build(testing)
    tree, arrays = to_config(m)
    m2 = from_config(tree, arrays)
    from models_tpu.core.block import iter_blocks
    from models_tpu.outputs.contrastive import ContrastiveOutput
    from models_tpu.inputs.embedding import EmbeddingTable

    out2 = [b for b in iter_blocks(m2) if isinstance(b, ContrastiveOutput)][0]
    tables2 = [b for b in iter_blocks(m2) if isinstance(b, EmbeddingTable)]
    # the tied item table inside the head must BE one of the input tables
    assert any(out2.table is t for t in tables2)


def test_shared_ref_encoding():
    from models_tpu.blocks.mlp import Dense
    from models_tpu.core.combinators import ParallelBlock

    d = Dense(4)
    block = ParallelBlock({"a": d, "b": d})
    tree, arrays = to_config(block)
    text = json.dumps(tree)
    assert text.count("mlp:Dense") == 1  # class node serialized once, then __ref__
    block2 = from_config(tree, arrays)
    assert block2["a"] is block2["b"]


def test_save_load_after_fit_matches_sequence_model(tmp_path):
    seq = generate_data("sequence-testing", num_rows=64)
    m = mm.SessionBasedTransformerModel(seq.schema, embedding_dim=8)
    m.compile()
    from models_tpu.transforms.sequence import SequencePredictNext

    m.fit(seq, epochs=1, batch_size=16, verbose=0,
          pre=SequencePredictNext(seq.schema, target="item_id_seq"))
    p = str(tmp_path / "session")
    m.save(p)
    assert os.path.exists(os.path.join(p, "config.json"))
    m2 = mm.load_model(p)
    assert m2.block_name == "session_transformer"  # post-init name preserved


def test_export_serving_roundtrip(tmp_path):
    """StableHLO serving export: artifact files, loaded outputs match predict,
    and the artifact is pure-jax loadable (no model code in the program)."""
    import os

    from models_tpu.core.types import to_device_batch
    from models_tpu.data import Loader, generate_data
    from models_tpu.models import DLRMModel
    from models_tpu.utils.io import load_serving

    ds = generate_data("e-commerce", num_rows=128)
    m = DLRMModel(ds.schema, embedding_dim=8, bottom_block=(8,), top_block=(8,))
    m.compile()
    m.fit(ds, epochs=1, batch_size=32, verbose=0)
    path = m.export_serving(str(tmp_path / "srv"), data=ds, batch_size=32)
    assert {"serving.stablehlo", "weights.npz", "serving_spec.json", ".merlin"} <= set(
        os.listdir(path)
    )

    sm = load_serving(path)
    x, _ = Loader(ds, batch_size=32, shuffle=False, drop_last=True).peek()
    x = {k: v for k, v in to_device_batch(x).items() if k != "__row_valid__"}
    out = sm(x)
    ref = m.predict(ds, batch_size=32)
    for task in out:
        np.testing.assert_allclose(
            np.asarray(out[task]), np.asarray(ref[task])[:32], rtol=1e-5
        )


def test_export_serving_retrieval_topk(tmp_path):
    """TopK encoder exports: serving call returns scores+ids for the catalog."""
    from models_tpu.core.types import to_device_batch
    from models_tpu.data import Loader, generate_data
    from models_tpu.models import MatrixFactorizationModel
    from models_tpu.utils.io import load_serving

    ds = generate_data("movielens-100k", num_rows=128)
    m = MatrixFactorizationModel(ds.schema, dim=8)
    m.compile()
    m.fit(ds, epochs=1, batch_size=32, verbose=0)
    topk = m.to_top_k_encoder(ds, k=5)
    topk.compile()
    path = topk.export_serving(str(tmp_path / "topk_srv"), data=ds, batch_size=32)
    sm = load_serving(path)
    x, _ = Loader(ds, batch_size=32, shuffle=False, drop_last=True).peek()
    x = {k: v for k, v in to_device_batch(x).items() if k != "__row_valid__"}
    out = sm(x)
    assert set(out) == {"scores", "ids"}
    assert np.asarray(out["scores"]).shape == (32, 5)
    # parity with the in-process encoder
    ref = topk.predict(ds, batch_size=32)
    np.testing.assert_allclose(
        np.asarray(out["scores"]), np.asarray(ref["scores"])[:32], rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(out["ids"]), np.asarray(ref["ids"])[:32])


def test_bf16_table_model_saves_declaratively(tmp_path):
    """dtype constructor args serialize into config.json (no pickle fallback)
    and bf16 tables round-trip through the f32-encoded state.npz exactly."""
    import warnings

    import jax.numpy as jnp
    import numpy as np

    from models_tpu.data import Dataset
    from models_tpu.models import MatrixFactorizationModel
    from models_tpu.schema import Schema, Tags, create_categorical_column

    schema = Schema(
        [
            create_categorical_column("user_id", 20, tags=(Tags.USER, Tags.USER_ID)),
            create_categorical_column("item_id", 20, tags=(Tags.ITEM, Tags.ITEM_ID)),
        ]
    )
    rows = np.arange(64, dtype=np.int32) % 20
    ds = Dataset({"user_id": rows, "item_id": rows.copy()}, schema=schema)
    m = MatrixFactorizationModel(schema, dim=8, table_dtype=jnp.bfloat16)
    m.compile(optimizer="adam", embedding_optimizer="adagrad")
    m.fit(ds, epochs=1, batch_size=32, verbose=0)
    d = str(tmp_path / "m")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # pickle-fallback warning = failure
        m.save(d)
    import os

    assert "config.json" in os.listdir(d)
    from models_tpu import load_model

    m2 = load_model(d)
    for t in m2._embedding_tables():
        assert t.table.value.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        m.query_encoder.table.to_array().astype(np.float32),
        m2.query_encoder.table.to_array().astype(np.float32),
    )


def test_export_serving_bf16_tables(tmp_path):
    """Serving export with bf16-at-rest tables: weights.npz stores bf16 as
    uint16 bit patterns + a dtype map, and load_serving reproduces the
    in-process predictions exactly."""
    import jax.numpy as jnp
    import numpy as np

    from models_tpu.core.types import to_device_batch
    from models_tpu.data import Dataset, Loader
    from models_tpu.models import MatrixFactorizationModel
    from models_tpu.schema import Schema, Tags, create_categorical_column
    from models_tpu.utils.io import load_serving

    schema = Schema(
        [
            create_categorical_column("user_id", 20, tags=(Tags.USER, Tags.USER_ID)),
            create_categorical_column("item_id", 20, tags=(Tags.ITEM, Tags.ITEM_ID)),
        ]
    )
    rows = np.arange(128, dtype=np.int32) % 20
    ds = Dataset({"user_id": rows, "item_id": rows.copy()}, schema=schema)
    m = MatrixFactorizationModel(schema, dim=8, table_dtype=jnp.bfloat16)
    m.compile(optimizer="adam", embedding_optimizer="adagrad")
    m.fit(ds, epochs=1, batch_size=32, verbose=0)
    path = m.export_serving(str(tmp_path / "srv"), data=ds, batch_size=32)
    sm = load_serving(path)
    assert any(w.dtype == jnp.bfloat16 for w in sm.weights.values())
    x, _ = Loader(ds, batch_size=32, shuffle=False, drop_last=True).peek()
    x = {k: v for k, v in to_device_batch(x).items() if k != "__row_valid__"}
    out = np.asarray(sm(x))
    ref = np.asarray(m.predict(ds, batch_size=32))[:32]
    np.testing.assert_allclose(out.reshape(ref.shape), ref, rtol=1e-5)


def test_export_serving_int8_index(tmp_path):
    """The bin-quantized int8 index (int8 candidates + per-bin f32 scales +
    permuted ids) survives StableHLO export: served ids/scores match the
    in-process encoder exactly."""
    import jax.numpy as jnp

    from models_tpu.core.types import to_device_batch
    from models_tpu.data import Loader, generate_data
    from models_tpu.models import MatrixFactorizationModel
    from models_tpu.utils.io import load_serving

    ds = generate_data("movielens-100k", num_rows=128)
    m = MatrixFactorizationModel(ds.schema, dim=8)
    m.compile()
    m.fit(ds, epochs=1, batch_size=32, verbose=0)
    topk = m.to_top_k_encoder(ds, k=5, candidate_dtype=jnp.int8)
    topk.compile()
    path = topk.export_serving(str(tmp_path / "topk8_srv"), data=ds, batch_size=32)
    sm = load_serving(path)
    x, _ = Loader(ds, batch_size=32, shuffle=False, drop_last=True).peek()
    x = {k: v for k, v in to_device_batch(x).items() if k != "__row_valid__"}
    out = sm(x)
    ref = topk({k: v for k, v in x.items()})
    ids = np.asarray(out["ids"] if isinstance(out, dict) else out[1])
    np.testing.assert_array_equal(ids, np.asarray(ref.identifiers))
    assert (ids >= 0).all()
