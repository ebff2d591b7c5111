"""Capstone workflow test: the reference's quickstart story end to end.

parquet → two-tower training (bf16 policy) → corpus top-k evaluation →
declarative save/load → StableHLO serving export → serve and cross-check —
every layer L1-L6 plus the serving boundary in one narrative.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.integration


def test_retrieval_production_workflow(tmp_path):
    import models_tpu as mm
    from models_tpu.core.types import to_device_batch
    from models_tpu.data import Dataset, Loader

    # L1: data lands as parquet with schema sidecars
    raw = mm.generate_data("movielens-100k", num_rows=1200)
    path = raw.to_parquet(str(tmp_path / "data"), num_partitions=2)
    train, valid = Dataset.from_parquet(path).split([0.8, 0.2], seed=7)

    # L5/L6: train under the production dtype policy
    mm.set_dtype_policy("mixed_bfloat16")
    try:
        model = mm.MatrixFactorizationModel(train.schema, dim=16)
        model.compile(optimizer="adam", learning_rate=0.03)
        hist = model.fit(train, epochs=2, batch_size=128, verbose=0)
    finally:
        mm.set_dtype_policy("float32")
    assert hist.history["loss"][-1] < hist.history["loss"][0]

    # corpus evaluation: index every unique item, score recall@10
    topk = model.to_top_k_encoder(train, k=10)
    topk.compile()
    res = topk.evaluate(valid, batch_size=128)
    assert 0.0 <= res["recall_at_10"] <= 1.0

    # persistence: declarative save → reload → identical predictions
    mdir = str(tmp_path / "model")
    model.save(mdir)
    reloaded = mm.load_model(mdir)
    x, _ = Loader(valid, batch_size=128, shuffle=False, drop_last=True).peek()
    x = dict(x)
    np.testing.assert_allclose(
        np.asarray(model.predict(x)), np.asarray(reloaded.predict(x)), rtol=1e-5
    )

    # serving: code-free StableHLO artifact serves the same top-k as in-process
    sdir = topk.export_serving(str(tmp_path / "serving"), data=train, batch_size=128)
    serving = mm.load_serving(sdir)
    q = {k: v for k, v in to_device_batch(x).items() if k != "__row_valid__"}
    out = serving(q)
    ref = topk.predict(q)
    np.testing.assert_allclose(
        np.asarray(out["scores"]), np.asarray(ref["scores"]), rtol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(out["ids"]), np.asarray(ref["ids"]))

    # .merlin sidecars ship with both artifacts (Merlin Systems contract)
    import os

    for d in (mdir, sdir):
        assert os.path.exists(os.path.join(d, ".merlin", "input_schema.json"))
