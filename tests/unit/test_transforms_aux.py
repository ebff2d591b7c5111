import jax
import jax.numpy as jnp
import numpy as np
import pytest

from models_tpu.core.types import ModelContext, Prediction, SequenceFeature
from models_tpu.data import Dataset, generate_data
from models_tpu.metrics.evaluation import ItemCoverageAt, NoveltyAt, PopularityBiasAt
from models_tpu.outputs.queue import CachedCrossBatchSampler, FIFOQueue
from models_tpu.outputs.sampling import Candidate
from models_tpu.transforms.bias import PopularityLogitsCorrection
from models_tpu.transforms.negative_sampling import InBatchNegatives
from models_tpu.transforms.noise import StochasticSwapNoise
from models_tpu.utils.callbacks import EarlyStopping, ExamplesPerSecondCallback
from models_tpu.utils.checkpoint import CheckpointManager
from models_tpu.utils.misc import Timing


def test_popularity_logits_correction():
    freqs = np.array([100.0, 10.0, 1.0])
    corr = PopularityLogitsCorrection(freqs)
    logits = jnp.zeros((2, 4))  # [pos | 3 negs]
    pred = Prediction(outputs=logits, targets=None,
                      negative_candidate_ids=jnp.array([0, 1, 2]))
    out = corr(pred)
    # popular item 0 gets the largest subtraction -> most negative logit
    arr = np.asarray(out.outputs)
    assert arr[0, 1] < arr[0, 2] < arr[0, 3]
    assert arr[0, 0] == 0.0  # positive column untouched


def test_stochastic_swap_noise():
    x = {"a": jnp.arange(32, dtype=jnp.float32)}
    t = StochasticSwapNoise(pad_ratio=0.5, seed=1)
    ctx = ModelContext()
    ctx["step"] = 0
    out = t(x, training=True, context=ctx)
    changed = (np.asarray(out["a"]) != np.asarray(x["a"])).mean()
    assert 0.1 < changed < 0.9
    # inference: untouched
    out2 = t(x, training=False)
    np.testing.assert_array_equal(np.asarray(out2["a"]), np.asarray(x["a"]))


def test_in_batch_negatives(music_streaming_data):
    from models_tpu.data import Loader

    schema = music_streaming_data.schema
    loader = Loader(music_streaming_data, 16, drop_last=True)
    x, y = loader.peek()
    from models_tpu.core.types import to_device_batch

    x = to_device_batch(x)
    t = InBatchNegatives(schema, n_per_positive=2)
    ctx = ModelContext(features=x)
    ctx["step"] = 0
    x2, y2 = t(x, targets={k: jnp.asarray(v) for k, v in y.items()}, context=ctx)
    assert x2["item_id"].shape[0] == 48
    assert x2["user_id"].shape[0] == 48
    # user features repeat, item features shuffle
    np.testing.assert_array_equal(np.asarray(x2["user_id"][:16]), np.asarray(x2["user_id"][16:32]))
    assert y2["click"].shape[0] == 48
    assert float(y2["click"][16:].sum()) == 0.0


def test_fifo_queue_wraps():
    q = FIFOQueue(capacity=8, dim=4)
    q.enqueue(jnp.arange(6), jnp.ones((6, 4)))
    q.enqueue(jnp.arange(6, 12), 2 * jnp.ones((6, 4)))
    snap = q.snapshot()
    ids = np.asarray(snap.id)
    # capacity 8, 12 enqueued -> ids 4..11 present (ring wrapped)
    assert set(ids.tolist()) == set(range(4, 12))


def test_cross_batch_sampler():
    s = CachedCrossBatchSampler(capacity=16, dim=4)
    pos = Candidate(id=jnp.arange(8), embedding=jnp.ones((8, 4)))
    first = s(pos, training=True)
    assert (np.asarray(first.id) == -1).all()  # empty before first enqueue
    second = s(pos, training=True)
    assert (np.asarray(second.id)[:8] == np.arange(8)).all()


def test_beyond_accuracy_metrics():
    freqs = np.array([1000.0, 100.0, 10.0, 1.0])
    ids = jnp.array([[0, 1], [2, 3]])
    for metric, check in [
        (NoveltyAt(freqs, k=2), lambda v: v > 0),
        (PopularityBiasAt(freqs, k=2), lambda v: 0 <= v <= 1),
        (ItemCoverageAt(freqs, k=2), lambda v: abs(v - 1.0) < 1e-6),
    ]:
        state = metric.init_state()
        state = metric.update(state, None, ids)
        assert check(float(metric.result(state)))


def test_item_coverage_partial():
    freqs = np.ones(10)
    m = ItemCoverageAt(freqs, k=2)
    state = m.init_state()
    state = m.update(state, None, jnp.array([[0, 1]]))
    assert abs(float(m.result(state)) - 0.2) < 1e-6


def test_early_stopping():
    class FakeModel:
        stop_training = False

    cb = EarlyStopping(monitor="loss", patience=2)
    cb.set_model(FakeModel())
    for epoch, loss in enumerate([1.0, 0.9, 0.95, 0.97, 0.99]):
        cb.on_epoch_end(epoch, {"loss": loss})
    assert cb.model.stop_training


def test_checkpoint_roundtrip(tmp_path):
    from models_tpu.models import MatrixFactorizationModel
    from models_tpu.schema import Schema, Tags, create_categorical_column

    schema = Schema(
        [
            create_categorical_column("user_id", 20, tags=(Tags.USER, Tags.USER_ID)),
            create_categorical_column("item_id", 20, tags=(Tags.ITEM, Tags.ITEM_ID)),
        ]
    )
    ds = Dataset(
        {"user_id": np.arange(32, dtype=np.int32) % 20,
         "item_id": np.arange(32, dtype=np.int32) % 20},
        schema=schema,
    )
    m = MatrixFactorizationModel(schema, dim=8)
    m.build(ds)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, m)
    before = m.query_encoder.table.to_array().copy()
    # perturb then restore
    from flax import nnx

    m.query_encoder.table.table.value = m.query_encoder.table.table.value + 1.0
    mgr.restore(m, step=0)
    np.testing.assert_allclose(m.query_encoder.table.to_array(), before, rtol=1e-6)


def test_timing():
    with Timing("", log_fn=lambda s: None) as t:
        pass
    assert t["seconds"] >= 0


def test_model_checkpoint_callback(tmp_path):
    from models_tpu.models import MatrixFactorizationModel
    from models_tpu.schema import Schema, Tags, create_categorical_column
    from models_tpu.utils.checkpoint import ModelCheckpoint

    schema = Schema(
        [
            create_categorical_column("user_id", 20, tags=(Tags.USER, Tags.USER_ID)),
            create_categorical_column("item_id", 20, tags=(Tags.ITEM, Tags.ITEM_ID)),
        ]
    )
    ds = Dataset(
        {"user_id": np.arange(64, dtype=np.int32) % 20,
         "item_id": np.arange(64, dtype=np.int32) % 20},
        schema=schema,
    )
    m = MatrixFactorizationModel(schema, dim=8)
    m.compile()
    cb = ModelCheckpoint(str(tmp_path / "ckpts"), every_n_epochs=1)
    m.fit(ds, epochs=2, batch_size=16, callbacks=[cb], verbose=0)
    assert cb.manager.all_steps() == [0, 1]
    # restore epoch-0 weights into a fresh model
    m2 = MatrixFactorizationModel(schema, dim=8)
    m2.build(ds)
    step, _ = cb.manager.restore(m2, step=1)
    assert step == 1
    np.testing.assert_allclose(
        m2.query_encoder.table.to_array(), m.query_encoder.table.to_array(), rtol=1e-6
    )


def test_loader_empty_error():
    from models_tpu.data import Loader, generate_data

    ds = generate_data("testing", num_rows=10)
    with pytest.raises(ValueError, match="no batches"):
        Loader(ds, batch_size=64, drop_last=True).peek()


def test_fifo_queue_exact_capacity_and_multi_enqueue():
    from models_tpu.outputs.queue import FIFOQueue

    q = FIFOQueue(capacity=6, dim=2)
    q.enqueue(jnp.array([1, 2, 3]), jnp.ones((3, 2)))
    q.enqueue(jnp.array([4, 5, 6]), 2 * jnp.ones((3, 2)))
    snap = q.snapshot()
    np.testing.assert_array_equal(np.asarray(snap.id), [1, 2, 3, 4, 5, 6])
    assert bool(snap.valid.all())
    # exact-capacity wrap: cursor returns to 0, next enqueue overwrites oldest
    q.enqueue(jnp.array([7, 8]), 3 * jnp.ones((2, 2)))
    snap2 = q.snapshot()
    np.testing.assert_array_equal(np.asarray(snap2.id), [7, 8, 3, 4, 5, 6])
    np.testing.assert_allclose(np.asarray(snap2.embedding[0]), 3.0)


def test_fifo_queue_unfilled_slots_invalid():
    from models_tpu.outputs.queue import FIFOQueue

    q = FIFOQueue(capacity=4, dim=2)
    q.enqueue(jnp.array([9]), jnp.ones((1, 2)))
    snap = q.snapshot()
    np.testing.assert_array_equal(np.asarray(snap.valid), [True, False, False, False])


def test_cross_batch_sampler_masks_unfilled_in_head():
    """A half-filled queue's empty slots must be downscored to MIN_FLOAT by the
    contrastive head (not scored as zero vectors)."""
    from models_tpu.inputs import EmbeddingTable
    from models_tpu.outputs import ContrastiveOutput
    from models_tpu.outputs.contrastive import MIN_FLOAT
    from models_tpu.outputs.queue import CachedCrossBatchSampler
    from models_tpu.core.types import ModelContext
    from models_tpu.schema import Tags, create_categorical_column

    col = create_categorical_column("item_id", 30, tags=(Tags.ITEM, Tags.ITEM_ID))
    table = EmbeddingTable(4, col, seed=0)
    sampler = CachedCrossBatchSampler(capacity=8, dim=4)
    head = ContrastiveOutput(table, negative_samplers=[sampler])

    def apply_updates(ctx):
        # play the engine's role: write the functional state updates back
        upd = ctx.get("state_updates", {}).get(sampler._state_key)
        assert upd is not None
        for field, var in sampler.state_update_targets().items():
            var.value = upd[field]

    ctx = ModelContext()
    ctx.features = {"item_id": jnp.array([1, 2, 3])}
    ctx["step"] = 0
    q = jnp.ones((3, 4))
    # first call: queue is empty -> ALL negative columns downscored
    pred1 = head(q, training=True, context=ctx)
    assert np.asarray(pred1.outputs[:, 1:]).max() <= MIN_FLOAT / 2
    apply_updates(ctx)
    # second call: the 3 enqueued positives are now valid negatives
    ctx2 = ModelContext()
    ctx2.features = {"item_id": jnp.array([4, 5, 6])}
    ctx2["step"] = 1
    pred2 = head(q, training=True, context=ctx2)
    neg = np.asarray(pred2.outputs[:, 1:])
    assert (neg > MIN_FLOAT / 2).sum(axis=1).min() == 3  # exactly 3 real negatives


def test_cross_batch_queue_fills_during_jitted_fit():
    """End-to-end: the FIFO queue state must advance inside the compiled train
    step (functional state updates through the engine, not Variable mutation)."""
    from models_tpu.data import generate_data
    from models_tpu.models import MatrixFactorizationModel
    from models_tpu.outputs.queue import CachedCrossBatchSampler

    ds = generate_data("movielens-100k", num_rows=128)
    sampler = CachedCrossBatchSampler(capacity=48, dim=8)
    m = MatrixFactorizationModel(ds.schema, dim=8, negative_samplers=[sampler, "in-batch"])
    m.compile(learning_rate=0.05)
    h = m.fit(ds, epochs=2, batch_size=32, shuffle=False, verbose=0)
    assert np.isfinite(h.history["loss"]).all()
    q_ids = np.asarray(sampler.queue.ids.value)
    assert (q_ids >= 0).all()  # 128 rows x 2 epochs through a 48-slot ring


def test_popularity_correction_from_parquet(tmp_path):
    """PopularityLogitsCorrection.from_parquet reads item frequencies from a
    parquet column (reference transforms/bias.py:78 from_parquet)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    freqs = np.array([100.0, 10.0, 1.0, 1.0], np.float32)
    pq.write_table(pa.table({"frequency": freqs}), str(tmp_path / "f.parquet"))
    corr = PopularityLogitsCorrection.from_parquet(str(tmp_path / "f.parquet"))
    c = np.asarray(corr.correction(jnp.array([0, 2])))
    assert c[0] > c[1]  # popular item gets the larger log-prob
    np.testing.assert_allclose(c[0] - c[1], np.log(100.0) - np.log(1.0), rtol=1e-5)


def test_profiler_callback_writes_trace(tmp_path):
    from models_tpu.utils.callbacks import ProfilerCallback

    cb = ProfilerCallback(log_dir=str(tmp_path / "trace"), start_step=1, num_steps=1)
    _ = jnp.ones(4) + 1  # some device work
    cb.on_batch_end(0, {})  # starts at step+1 == 1
    _ = (jnp.ones(64) * 2).sum()
    cb.on_batch_end(1, {})  # stops
    assert not cb._active
    import os

    assert os.path.isdir(str(tmp_path / "trace"))  # trace files captured


def test_checkpoint_resume_training_exact(tmp_path):
    """Preemption drill: fit with ModelCheckpoint, 'crash', build a fresh
    model, restore_training, continue with fit(initial_epoch=) — the stitched
    trajectory must match an uninterrupted run exactly (weights AND optimizer
    moments AND step count all resume)."""
    from models_tpu.models import MatrixFactorizationModel
    from models_tpu.schema import Schema, Tags, create_categorical_column
    from models_tpu.utils.checkpoint import CheckpointManager, ModelCheckpoint

    schema = Schema(
        [
            create_categorical_column("user_id", 20, tags=(Tags.USER, Tags.USER_ID)),
            create_categorical_column("item_id", 20, tags=(Tags.ITEM, Tags.ITEM_ID)),
        ]
    )
    rows = np.arange(256, dtype=np.int32) % 20
    ds = Dataset({"user_id": rows, "item_id": rows.copy()}, schema=schema)

    def build():
        m = MatrixFactorizationModel(schema, dim=8)
        m.compile(optimizer="adam", learning_rate=0.05)
        return m

    ref = build()
    full = ref.fit(ds, epochs=6, batch_size=64, shuffle=False, verbose=0).history["loss"]

    m1 = build()
    cb = ModelCheckpoint(str(tmp_path / "ckpts"), every_n_epochs=1)
    part1 = m1.fit(
        ds, epochs=3, batch_size=64, shuffle=False, verbose=0, callbacks=[cb]
    ).history["loss"]
    del m1  # the "crash"

    m2 = build()
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    step = mgr.restore_training(m2, data=ds)
    assert step == 2  # last completed epoch index
    part2 = m2.fit(
        ds, epochs=6, batch_size=64, shuffle=False, verbose=0, initial_epoch=step + 1
    ).history["loss"]

    np.testing.assert_allclose(part1 + part2, full, rtol=1e-5)


def test_restore_training_requires_optimizer_payload(tmp_path):
    from models_tpu.models import MatrixFactorizationModel
    from models_tpu.schema import Schema, Tags, create_categorical_column
    from models_tpu.utils.checkpoint import CheckpointManager

    schema = Schema(
        [
            create_categorical_column("user_id", 20, tags=(Tags.USER, Tags.USER_ID)),
            create_categorical_column("item_id", 20, tags=(Tags.ITEM, Tags.ITEM_ID)),
        ]
    )
    rows = np.arange(64, dtype=np.int32) % 20
    ds = Dataset({"user_id": rows, "item_id": rows.copy()}, schema=schema)
    m = MatrixFactorizationModel(schema, dim=8)
    m.build(ds)
    mgr = CheckpointManager(str(tmp_path / "weights_only"))
    mgr.save(0, m)  # weights only
    m2 = MatrixFactorizationModel(schema, dim=8)
    m2.compile()
    with pytest.raises((ValueError, FileNotFoundError)):
        mgr.restore_training(m2, data=ds)


def test_checkpoint_resume_training_on_mesh(tmp_path):
    """Regression (review): restore_training(mesh=...) must arm the optimizer
    state with the mesh fingerprint, or the resumed fit(mesh=...) silently
    re-initializes the moments. Stitched mesh trajectory == uninterrupted."""
    import jax

    from models_tpu.models import MatrixFactorizationModel
    from models_tpu.parallel.mesh import make_mesh
    from models_tpu.schema import Schema, Tags, create_categorical_column
    from models_tpu.utils.checkpoint import CheckpointManager, ModelCheckpoint

    devices = jax.devices("cpu")[:4]
    mesh = make_mesh({"data": 2, "model": 2}, devices=devices)

    schema = Schema(
        [
            create_categorical_column("user_id", 23, tags=(Tags.USER, Tags.USER_ID)),
            create_categorical_column("item_id", 23, tags=(Tags.ITEM, Tags.ITEM_ID)),
        ]
    )
    rows = np.arange(256, dtype=np.int32) % 23
    ds = Dataset({"user_id": rows, "item_id": rows.copy()}, schema=schema)

    def build():
        m = MatrixFactorizationModel(schema, dim=8)
        m.compile(optimizer="adam", learning_rate=0.05)
        return m

    full = build().fit(
        ds, epochs=4, batch_size=64, shuffle=False, verbose=0, mesh=mesh
    ).history["loss"]

    m1 = build()
    cb = ModelCheckpoint(str(tmp_path / "mesh_ckpts"), every_n_epochs=1)
    part1 = m1.fit(ds, epochs=2, batch_size=64, shuffle=False, verbose=0,
                   mesh=mesh, callbacks=[cb]).history["loss"]
    del m1

    m2 = build()
    step = CheckpointManager(str(tmp_path / "mesh_ckpts")).restore_training(
        m2, data=ds, mesh=mesh
    )
    part2 = m2.fit(ds, epochs=4, batch_size=64, shuffle=False, verbose=0,
                   mesh=mesh, initial_epoch=step + 1).history["loss"]
    np.testing.assert_allclose(part1 + part2, full, rtol=1e-4)


def test_csv_logger_and_terminate_on_nan(tmp_path):
    """CSVLogger writes one row per epoch (+header) and closes on train end;
    TerminateOnNaN stops on non-finite epoch loss (Keras-parity callbacks)."""
    from models_tpu.models import MatrixFactorizationModel
    from models_tpu.schema import Schema, Tags, create_categorical_column
    from models_tpu.utils.callbacks import CSVLogger, TerminateOnNaN

    schema = Schema(
        [
            create_categorical_column("user_id", 20, tags=(Tags.USER, Tags.USER_ID)),
            create_categorical_column("item_id", 20, tags=(Tags.ITEM, Tags.ITEM_ID)),
        ]
    )
    rows = np.arange(128, dtype=np.int32) % 20
    ds = Dataset({"user_id": rows, "item_id": rows.copy()}, schema=schema)
    m = MatrixFactorizationModel(schema, dim=8)
    m.compile()
    path = str(tmp_path / "log.csv")
    m.fit(ds, epochs=3, batch_size=32, verbose=0,
          callbacks=[CSVLogger(path), TerminateOnNaN()])
    lines = open(path).read().strip().splitlines()
    assert len(lines) == 4  # header + 3 epochs
    assert lines[0].startswith("epoch,")
    assert lines[1].split(",")[0] == "0"

    # a diverging run stops early
    m2 = MatrixFactorizationModel(schema, dim=8)
    m2.compile(optimizer="sgd", learning_rate=1e12)  # guaranteed blow-up
    h = m2.fit(ds, epochs=6, batch_size=32, verbose=0, callbacks=[TerminateOnNaN()])
    assert len(h.history["loss"]) < 6


def test_csv_logger_unions_late_columns(tmp_path):
    """Regression (review): columns appearing after epoch 0 (e.g. val_* with
    validation_freq=2) must be unioned into the CSV, not silently dropped."""
    from models_tpu.utils.callbacks import CSVLogger

    path = str(tmp_path / "log.csv")
    cb = CSVLogger(path)
    cb.on_epoch_end(0, {"loss": 1.0})
    cb.on_epoch_end(1, {"loss": 0.5, "val_loss": 0.7})
    cb.on_train_end()
    lines = open(path).read().strip().splitlines()
    assert lines[0] == "epoch,loss,val_loss"
    assert lines[1].split(",") == ["0", "1", ""]  # epoch 0 has no val_loss
    assert lines[2].split(",") == ["1", "0.5", "0.7"]

    # append mode onto an existing file keeps the on-disk header fixed
    cb2 = CSVLogger(path, append=True)
    cb2.on_epoch_end(2, {"loss": 0.25, "val_loss": 0.6, "extra": 9.0})
    cb2.on_train_end()
    lines = open(path).read().strip().splitlines()
    assert lines[0] == "epoch,loss,val_loss"  # unchanged
    assert len(lines) == 4


def test_fifo_queue_batch_larger_than_capacity_keeps_newest():
    """Regression (review): enqueueing more rows than capacity must keep the
    LAST `capacity` rows (FIFO) — the old row-scatter produced duplicate
    indices with unspecified write order."""
    q = FIFOQueue(capacity=8, dim=4)
    n = 20
    ids = jnp.arange(n)
    emb = jnp.arange(n, dtype=jnp.float32)[:, None] * jnp.ones((1, 4))
    q.enqueue(ids, emb)
    assert sorted(np.asarray(q.ids.value).tolist()) == list(range(12, 20))
    # embeddings track their ids
    for slot in range(8):
        sid = int(q.ids.value[slot])
        np.testing.assert_allclose(np.asarray(q.embeddings.value[slot]), float(sid))
    # ring order: continuing with a small batch evicts the OLDEST (id 12)
    q.enqueue(jnp.asarray([100]), jnp.full((1, 4), 100.0))
    kept = sorted(np.asarray(q.ids.value).tolist())
    assert 12 not in kept and 100 in kept


def test_fifo_queue_wrap_matches_numpy_reference():
    """Ring writes across many odd-sized batches agree with a host loop."""
    rng = np.random.default_rng(0)
    cap, dim = 8, 3
    q = FIFOQueue(capacity=cap, dim=dim)
    ref_ids = np.full((cap,), -1, np.int32)
    ref_emb = np.zeros((cap, dim), np.float32)
    cur = 0
    next_id = 0
    for bs in [3, 5, 2, 7, 4, 6, 1, 5]:
        ids = np.arange(next_id, next_id + bs, dtype=np.int32)
        emb = rng.standard_normal((bs, dim)).astype(np.float32)
        next_id += bs
        q.enqueue(jnp.asarray(ids), jnp.asarray(emb))
        for i in range(bs):
            ref_ids[cur] = ids[i]
            ref_emb[cur] = emb[i]
            cur = (cur + 1) % cap
    np.testing.assert_array_equal(np.asarray(q.ids.value), ref_ids)
    np.testing.assert_allclose(np.asarray(q.embeddings.value), ref_emb, rtol=1e-6)
    assert int(q.cursor.value) == cur


def test_topk_id_metrics_ignore_padding_sentinel():
    """Regression (review): id -1 (top-k padding) must not pollute novelty/
    popularity-bias with item 0's stats nor mark item 0 as covered."""
    freqs = np.array([100.0, 1.0, 1.0, 1.0])  # item 0 hugely popular
    ids_clean = jnp.asarray([[1, 2]])
    ids_padded = jnp.asarray([[1, 2, -1, -1]])

    m = NoveltyAt(freqs, k=2)
    clean = m.result(m.update(m.init_state(), None, ids_clean))
    m4 = NoveltyAt(freqs, k=4)
    padded = m4.result(m4.update(m4.init_state(), None, ids_padded))
    np.testing.assert_allclose(float(clean), float(padded), rtol=1e-6)

    c = ItemCoverageAt(freqs, k=4)
    st = c.update(c.init_state(), None, jnp.asarray([[1, 2, -1, -1]]))
    assert abs(float(c.result(st)) - 0.5) < 1e-6  # items 1,2 of 4; NOT item 0
