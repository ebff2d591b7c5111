import jax
import jax.numpy as jnp
import numpy as np
import pytest

from models_tpu.parallel.mesh import (
    DEFAULT_RULES,
    batch_sharding,
    make_mesh,
    shard_batch,
    shard_state,
    sharding_for_tree,
)


def cpu_mesh(shape):
    n = int(np.prod(list(shape.values())))
    return make_mesh(shape, devices=jax.devices("cpu")[:n])


def test_make_mesh_shapes():
    mesh = cpu_mesh({"data": 4, "model": 2})
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh({"data": 3}, devices=jax.devices("cpu")[:8])


def test_sharding_rules_tables_divisible():
    from flax import nnx

    from models_tpu.inputs.embedding import EmbeddingTable
    from models_tpu.schema import create_categorical_column

    mesh = cpu_mesh({"data": 2, "model": 2})
    table = EmbeddingTable(8, create_categorical_column("item", 99))  # 100→104 padded rows
    graphdef, state = nnx.split(table)
    shardings = sharding_for_tree(state, mesh)
    leaves = jax.tree_util.tree_leaves_with_path(shardings)
    from models_tpu.parallel.mesh import _path_to_str

    table_sharding = [s for p, s in leaves if "table" in _path_to_str(p)][0]
    assert table_sharding.spec == jax.sharding.PartitionSpec("model", None)


def test_sharding_rules_skip_indivisible():
    from flax import nnx

    from models_tpu.inputs.embedding import EmbeddingTable
    from models_tpu.schema import create_categorical_column

    mesh = cpu_mesh({"data": 2, "model": 2})
    # 8 rows padded stays 8 → divisible; use dim not divisible? rows 8 % 2 == 0.
    # use a mesh axis of 3... not possible with 8 devs; instead check replication
    # for a rule that doesn't fit via a fake 3-axis is skipped on dims check
    from models_tpu.parallel.mesh import _spec_fits
    from jax.sharding import PartitionSpec as P

    assert _spec_fits(P("model", None), (104, 8), mesh)
    assert not _spec_fits(P("model", None), (7, 8), mesh)


def test_shard_batch_places_leading_axis():
    mesh = cpu_mesh({"data": 4, "model": 2})
    batch = {"a": jnp.ones((16, 3)), "b": jnp.ones((7,))}  # 7 not divisible → replicated
    out = shard_batch(batch, mesh)
    assert out["a"].sharding.spec == jax.sharding.PartitionSpec("data")
    assert out["b"].sharding.spec == jax.sharding.PartitionSpec()


def test_fit_on_mesh_matches_single_device():
    """Data-parallel fit over a 4-device mesh must reproduce 1-device training
    (same batches, deterministic init → same loss trajectory)."""
    from models_tpu.data import Dataset
    from models_tpu.models import MatrixFactorizationModel
    from models_tpu.schema import Schema, Tags, create_categorical_column

    rng = np.random.default_rng(0)
    users = rng.integers(0, 49, size=256).astype(np.int32)
    schema = Schema(
        [
            create_categorical_column("user_id", 49, tags=(Tags.USER, Tags.USER_ID)),
            create_categorical_column("item_id", 49, tags=(Tags.ITEM, Tags.ITEM_ID)),
        ]
    )
    ds = Dataset({"user_id": users, "item_id": users.copy()}, schema=schema)

    def run(mesh):
        m = MatrixFactorizationModel(schema, dim=8)
        m.compile(optimizer="adam", learning_rate=0.05)
        h = m.fit(ds, epochs=2, batch_size=32, shuffle=False, verbose=0, mesh=mesh)
        return h.history["loss"]

    losses_single = run(None)
    losses_mesh = run(cpu_mesh({"data": 4, "model": 1}))
    np.testing.assert_allclose(losses_single, losses_mesh, rtol=1e-4)


def test_fit_on_model_sharded_mesh_matches_single_device():
    """Hybrid DP×MP fit (tables row-sharded via sharded_lookup, batch over data)
    must reproduce the single-device loss trajectory."""
    from models_tpu.data import generate_data
    from models_tpu.models import TwoTowerModel

    ds = generate_data("movielens-100k", num_rows=128)

    def run(mesh):
        m = TwoTowerModel(ds.schema, query_tower=(16, 8), embedding_dim=8)
        m.compile(optimizer="adam", learning_rate=0.05)
        h = m.fit(ds, epochs=2, batch_size=16, shuffle=False, verbose=0, mesh=mesh)
        return h.history["loss"]

    losses_single = run(None)
    losses_mesh = run(cpu_mesh({"data": 2, "model": 2}))
    np.testing.assert_allclose(losses_single, losses_mesh, rtol=2e-4)


def test_sharded_train_step_never_allgathers_tables():
    """Compile the model-sharded train step and assert the optimized HLO has no
    all-gather with a table-sized result: the SOK-equivalent property — lookups
    move (B, D) activations over ICI, never table rows."""
    import re

    from flax import nnx

    from models_tpu.core.types import to_device_batch
    from models_tpu.data import Loader, generate_data
    from models_tpu.models import TwoTowerModel
    from models_tpu.parallel.mesh import replicate, shard_batch, shard_state

    ds = generate_data("movielens-100k", num_rows=128)
    mesh = cpu_mesh({"data": 2, "model": 2})
    m = TwoTowerModel(ds.schema, query_tower=(32, 16), embedding_dim=32)
    m.compile()
    loader = Loader(ds, 16, drop_last=True)
    m.build(loader)
    graphdef, params, rest = m._split()
    params = shard_state(params, mesh)
    rest = replicate(rest, mesh)
    m._graphdef = graphdef
    loss_fns = m._resolve_task_losses()
    task_metrics = m._resolve_task_metrics()
    step = m._make_train_step(loss_fns, task_metrics, with_metrics=False, mesh=mesh)
    opt_state = shard_state(m._tx.init(params), mesh)
    metric_states = m._init_metric_states(task_metrics)
    x, y = loader.peek()
    x = shard_batch(to_device_batch(x), mesh)
    y = shard_batch({k: np.asarray(v) for k, v in y.items()}, mesh)
    import jax.numpy as jnp

    txt = step.lower(
        params, rest, opt_state, metric_states, x, y, jnp.asarray(0)
    ).compile().as_text()

    # smallest *real* table (movielens-100k user/item, cardinality ≥ 900): tiny
    # demographic tables (≤8 padded rows) are activation-sized and not the point
    min_table_elems = min(
        t.padded_rows * t.dim for t in m._embedding_tables() if t.padded_rows >= 128
    )
    assert min_table_elems > 4096  # well above any (B, D) activation in this model
    offenders = []
    for line in txt.splitlines():
        if "all-gather" not in line:
            continue
        for shape in re.findall(r"[a-z0-9]+\[([\d,]+)\]", line):
            elems = int(np.prod([int(d) for d in shape.split(",") if d]))
            if elems >= min_table_elems:
                offenders.append(line.strip()[:160])
                break
    assert not offenders, "table-sized all-gather found:\n" + "\n".join(offenders)


def test_chief_guards():
    from models_tpu.parallel.mesh import chief_only, is_chief, shared_seed

    assert is_chief()
    calls = []

    @chief_only
    def record():
        calls.append(1)
        return "ran"

    assert record() == "ran"
    assert shared_seed(7) == 7


def test_steps_per_execution_matches_single_step():
    """k-batches-per-dispatch (steps_per_execution) must reproduce the
    single-step trajectory, including a leftover partial chunk."""
    from models_tpu.data import Dataset
    from models_tpu.models import MatrixFactorizationModel
    from models_tpu.schema import Schema, Tags, create_categorical_column

    rng = np.random.default_rng(0)
    users = rng.integers(0, 49, size=7 * 32).astype(np.int32)  # 7 batches: 4+3
    schema = Schema(
        [
            create_categorical_column("user_id", 49, tags=(Tags.USER, Tags.USER_ID)),
            create_categorical_column("item_id", 49, tags=(Tags.ITEM, Tags.ITEM_ID)),
        ]
    )
    ds = Dataset({"user_id": users, "item_id": users.copy()}, schema=schema)

    def run(spe):
        m = MatrixFactorizationModel(schema, dim=8)
        m.compile(optimizer="adam", learning_rate=0.05, steps_per_execution=spe,
                  train_metrics_steps=100)
        h = m.fit(ds, epochs=2, batch_size=32, shuffle=False, verbose=0)
        return h.history["loss"]

    np.testing.assert_allclose(run(1), run(4), rtol=1e-4)


def test_device_resident_path_matches_host_path_shuffled():
    """The device-resident data path (upload once, gather on device) must
    reproduce the host-loader trajectory exactly, including shuffling."""
    from models_tpu.data import generate_data
    from models_tpu.models import TwoTowerModel

    ds = generate_data("movielens-100k", num_rows=160)

    def run(spe):
        m = TwoTowerModel(ds.schema, query_tower=(16, 8), embedding_dim=8)
        m.compile(optimizer="adam", learning_rate=0.05, steps_per_execution=spe,
                  train_metrics_steps=100)
        h = m.fit(ds, epochs=2, batch_size=16, shuffle=True, verbose=0)
        return h.history["loss"]

    np.testing.assert_allclose(run(1), run(3), rtol=1e-4)


def test_fused_epochs_path_matches_single_step():
    """Full-fit fusion (all epochs in ONE dispatch when data is
    device-resident and there are no callbacks/validation) must reproduce the
    per-step trajectory — losses AND per-epoch metric results."""
    from models_tpu.data import generate_data
    from models_tpu.models import TwoTowerModel

    ds = generate_data("movielens-100k", num_rows=160)

    def run(spe):
        m = TwoTowerModel(ds.schema, query_tower=(16, 8), embedding_dim=8)
        m.compile(optimizer="adam", learning_rate=0.05, steps_per_execution=spe)
        h = m.fit(ds, epochs=2, batch_size=16, shuffle=True, verbose=0)
        return h.history

    ref, fused = run(1), run(3)
    assert set(ref) == set(fused)
    for key in ref:
        if key == "examples_per_sec":
            continue
        np.testing.assert_allclose(ref[key], fused[key], rtol=1e-4, err_msg=key)


def test_fused_fit_with_validation_matches_per_epoch_eval():
    """When validation data also fits on device, the fused fit runs the eval
    scan inside the SAME dispatch; per-epoch val metrics must match the
    epoch-loop path (which calls evaluate() between epochs)."""
    from models_tpu.data import generate_data
    from models_tpu.models import TwoTowerModel

    ds = generate_data("movielens-100k", num_rows=160)
    val = generate_data("movielens-100k", num_rows=80, seed=7)

    def run(fused):
        m = TwoTowerModel(ds.schema, query_tower=(16, 8), embedding_dim=8)
        m.compile(optimizer="adam", learning_rate=0.05, steps_per_execution=5)

        class Dummy:  # any callback forces the per-epoch path
            pass

        h = m.fit(ds, epochs=2, batch_size=16, shuffle=True, verbose=0,
                  validation_data=val, callbacks=None if fused else [Dummy()])
        return h.history

    fused, looped = run(True), run(False)
    assert any(k.startswith("val_") for k in fused)
    assert set(fused) == set(looped)
    for key in fused:
        if key == "examples_per_sec":
            continue
        np.testing.assert_allclose(fused[key], looped[key], rtol=2e-4, err_msg=key)


def test_fused_evaluate_matches_streaming(monkeypatch):
    """Device-resident fused evaluate (one dispatch over the whole eval set,
    zero-padded final partial batch masked by ROW_VALID) must agree exactly
    with the streaming per-batch path."""
    from models_tpu.data import generate_data
    from models_tpu.models import TwoTowerModel
    from models_tpu.models.base import BaseModel

    ds = generate_data("movielens-100k", num_rows=150)  # 150 = 4*32 + 22
    m = TwoTowerModel(ds.schema, query_tower=(16, 8), embedding_dim=8)
    m.compile(optimizer="adam", learning_rate=0.05)
    m.fit(ds, epochs=1, batch_size=32, shuffle=False, verbose=0)

    fused = m.evaluate(ds, batch_size=32)
    monkeypatch.setattr(BaseModel, "_try_device_eval", lambda *a, **k: None)
    streaming = m.evaluate(ds, batch_size=32)
    assert set(fused) == set(streaming)
    for key in fused:
        np.testing.assert_allclose(fused[key], streaming[key], rtol=1e-4, err_msg=key)


def test_brute_force_sharded_topk_matches_single_device():
    """BruteForce over a model-sharded candidate matrix must agree exactly with
    single-device top-k, including id tie-handling (contiguous row shards keep
    global index order, so tie winners match lax.top_k's lowest-index rule)."""
    from models_tpu.outputs.topk import BruteForce

    rng = np.random.default_rng(3)
    C, D, B, k = 64, 8, 6, 5
    cand = rng.standard_normal((C, D)).astype(np.float32)
    # plant exact score ties: duplicate some candidate rows
    cand[17] = cand[3]
    cand[40] = cand[3]
    q = rng.standard_normal((B, D)).astype(np.float32)

    single = BruteForce(k=k).index(jnp.asarray(cand))
    s1 = single(jnp.asarray(q))

    mesh = cpu_mesh({"data": 1, "model": 4})
    sharded = BruteForce(k=k).index(jnp.asarray(cand), mesh=mesh)
    assert sharded.candidates.value.sharding.spec == jax.sharding.PartitionSpec("model", None)
    s2 = sharded(jnp.asarray(q))

    np.testing.assert_allclose(np.asarray(s1.scores), np.asarray(s2.scores), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(s1.identifiers), np.asarray(s2.identifiers))


def test_to_top_k_encoder_with_mesh(ecommerce_data):
    """End-to-end: retrieval model → mesh-sharded top-k encoder → evaluate."""
    from models_tpu.models import TwoTowerModel

    m = TwoTowerModel(ecommerce_data.schema, query_tower=(16, 8))
    m.compile()
    m.fit(ecommerce_data, epochs=1, batch_size=16, verbose=0)
    mesh = cpu_mesh({"data": 1, "model": 2})
    topk = m.to_top_k_encoder(ecommerce_data, k=5, mesh=mesh)
    res_mesh = topk.evaluate(ecommerce_data, batch_size=16)
    topk1 = m.to_top_k_encoder(ecommerce_data, k=5)
    res_single = topk1.evaluate(ecommerce_data, batch_size=16)
    for key in res_single:
        np.testing.assert_allclose(res_mesh[key], res_single[key], rtol=1e-5)


def test_distributed_initialize_single_process_noop():
    """Degenerate single-process init is a no-op (the reference's strategy for
    testing Horovod paths without a cluster, SURVEY §4)."""
    from models_tpu.parallel import distributed

    distributed.initialize()  # must not raise or hang
    kw = distributed.local_loader_kwargs()
    assert kw == {"global_size": 1, "global_rank": 0}

    from models_tpu.data import Loader, generate_data

    ds = generate_data("e-commerce", num_rows=64)
    loader = Loader(ds, 16, **kw)
    assert len(loader) == 4

def test_dlrm_fit_on_mesh_matches_single_device():
    """DLRM (fused embedding table) under a DP x MP mesh must reproduce the
    single-device trajectory — covers the fused table's mesh lookup branch."""
    from models_tpu.data import generate_data
    from models_tpu.models import DLRMModel

    ds = generate_data("e-commerce", num_rows=128)

    def run(mesh):
        m = DLRMModel(ds.schema, embedding_dim=8, bottom_block=(8,), top_block=(8,))
        m.compile(optimizer="adam", learning_rate=0.05)
        h = m.fit(ds, epochs=2, batch_size=16, shuffle=False, verbose=0, mesh=mesh)
        return h.history["loss"]

    losses_single = run(None)
    losses_mesh = run(cpu_mesh({"data": 2, "model": 2}))
    np.testing.assert_allclose(losses_single, losses_mesh, rtol=2e-4)


def test_sparse_optimizer_on_mesh_matches_single_device():
    """Row-sparse embedding training (Pallas scatter path) on a DP x MP mesh
    must reproduce the single-device sparse trajectory — the SOK property of
    training model-sharded tables sparsely."""
    from models_tpu.data import generate_data
    from models_tpu.models import TwoTowerModel

    ds = generate_data("movielens-100k", num_rows=128)

    def run(mesh):
        m = TwoTowerModel(ds.schema, query_tower=(16, 8), embedding_dim=8)
        m.compile(optimizer="adam", learning_rate=0.05,
                  embedding_optimizer="sparse_adagrad")
        h = m.fit(ds, epochs=2, batch_size=16, shuffle=False, verbose=0, mesh=mesh)
        return h.history["loss"]

    losses_single = run(None)
    losses_mesh = run(cpu_mesh({"data": 2, "model": 2}))
    np.testing.assert_allclose(losses_single, losses_mesh, rtol=2e-4)


def _compiled_sparse_step_hlo(mesh, batch_size=16, dim=32):
    from flax import nnx

    from models_tpu.core.types import to_device_batch
    from models_tpu.data import Loader, generate_data
    from models_tpu.inputs.embedding import EmbeddingParam
    from models_tpu.models import TwoTowerModel
    from models_tpu.parallel.mesh import shard_batch, shard_state

    ds = generate_data("movielens-100k", num_rows=128)
    m = TwoTowerModel(ds.schema, query_tower=(32, 16), embedding_dim=dim)
    m.compile(embedding_optimizer="sparse_adagrad")
    loader = Loader(ds, batch_size, drop_last=True)
    m.build(loader)
    tap_shapes = m._setup_sparse_embeddings(loader, m._emb_opt)
    graphdef, emb_params, params, rest = nnx.split(m, EmbeddingParam, nnx.Param, ...)
    params = shard_state(params, mesh)
    emb_params = shard_state(emb_params, mesh)
    rest = shard_state(rest, mesh)
    m._graphdef = graphdef
    loss_fns = m._resolve_task_losses()
    task_metrics = m._resolve_task_metrics()
    step = m._make_sparse_train_step(
        loss_fns, task_metrics, tap_shapes, m._emb_opt, with_metrics=False, mesh=mesh
    )
    opt_state = shard_state(m._tx.init(params), mesh)
    metric_states = m._init_metric_states(task_metrics)
    x, y = loader.peek()
    x = shard_batch(to_device_batch(x), mesh)
    y = shard_batch({k: np.asarray(v) for k, v in y.items()}, mesh)
    txt = step.lower(
        params, emb_params, rest, opt_state, metric_states, x, y, jnp.asarray(0)
    ).compile().as_text()
    return m, txt


def _collective_lines(txt):
    """Per-collective (max_single_shape_bytes, total_bytes, groups, kind, line)
    for every collective op in the optimized (SPMD, per-device shapes) HLO."""
    import re

    dtype_bytes = {"f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4, "u32": 4,
                   "bf16": 2, "f16": 2, "s16": 2, "u16": 2, "pred": 1, "s8": 1, "u8": 1}
    out = []
    for line in txt.splitlines():
        m = re.match(
            r"\s*%?[\w.-]+ = (.*?) (all-gather|all-reduce|all-to-all|"
            r"reduce-scatter|collective-permute)\(",
            line,
        )
        if not m:
            continue
        shapes = []
        for dt, dims in re.findall(r"([a-z]+\d*)\[([\d,]*)\]", m.group(1)):
            elems = int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 1
            shapes.append(elems * dtype_bytes.get(dt, 4))
        gm = re.search(r"replica_groups=\{(\{[\d,]+\}(?:,\{[\d,]+\})*)\}", line)
        groups = None
        if gm:
            groups = frozenset(
                frozenset(int(x) for x in g.split(","))
                for g in re.findall(r"\{([\d,]+)\}", gm.group(1))
            )
        out.append((max(shapes), sum(shapes), groups, m.group(2), line.strip()[:160]))
    return out


def test_sparse_sharded_step_never_moves_tables():
    """The row-sparse train step on a DP x MP mesh must keep every collective
    activation-sized (no single table-shaped result anywhere) and the traffic
    over the MODEL axis bounded by a small multiple of B*D per lookup.
    (VERDICT r2 #1: comm over the model axis ~ B*D, not table-sized.)"""
    mesh = cpu_mesh({"data": 2, "model": 2})
    m, txt = _compiled_sparse_step_hlo(mesh)

    # big tables (the model-parallel point); tiny demographic tables are
    # activation-scale and indistinguishable from dense weight grads by size
    sharded_tables = [t for t in m._embedding_tables() if t.padded_rows % 2 == 0
                      and t.padded_rows >= 512]
    assert sharded_tables, "expected at least one model-sharded table"
    # smallest SHARD of a sharded table (per-device HLO shapes are local)
    min_shard_bytes = min(t.padded_rows * t.dim for t in sharded_tables) * 4 // 2

    lines = _collective_lines(txt)
    # (a) no collective result contains a table(-shard)-sized array
    offenders = [l for mx, _, _, _, l in lines if mx >= min_shard_bytes]
    assert not offenders, "table-sized collective found:\n" + "\n".join(offenders)

    # (b) model-axis traffic ~ B*D per lookup: identify model-axis collectives
    # by explicit replica groups matching the mesh's model-axis device rows
    model_groups = frozenset(
        frozenset(d.id for d in row) for row in mesh.devices  # rows = model axis
    )
    model_bytes = sum(tot for _, tot, g, _, _ in lines if g == model_groups)
    n_a2a = sum(1 for _, _, _, kind, _ in lines if kind == "all-to-all")
    n_lookups = max(1, n_a2a // 2)
    B_local, D = 16 // 2, 32
    bound = 3 * n_lookups * B_local * D * 4  # measured ~2.5KB/lookup at B_l*D=1KB
    assert model_bytes < bound, (
        f"model-axis collective traffic {model_bytes}B exceeds "
        f"{bound}B (~3*B*D per lookup x {n_lookups} lookups)"
    )
    # (c) the a2a lookup actually engaged (id exchange + row exchange)
    assert n_a2a >= 2


def test_eval_pack_respects_drop_last_and_compile_resets_caches():
    """Regressions: (a) a drop_last eval loader must NOT take the packed
    device path (streaming drops tail rows; packing all rows silently
    changes metrics); (b) compile() must invalidate every compiled-artifact
    cache — each closes over optimizer/loss state resolved at build time."""
    from models_tpu.data import generate_data
    from models_tpu.data.loader import Loader
    from models_tpu.models import TwoTowerModel

    ds = generate_data("movielens-100k", num_rows=100)
    m = TwoTowerModel(ds.schema, query_tower=(16, 8), embedding_dim=8)
    m.compile(optimizer="adam", learning_rate=0.05)
    m.fit(ds, epochs=1, batch_size=32, shuffle=False, verbose=0)

    assert m._pack_for_eval(Loader(ds, 32, drop_last=True)) is None
    assert m._pack_for_eval(Loader(ds, 32)) is not None

    m._fused_fit_cache["sentinel"] = 1
    m._epoch_log_cache["sentinel"] = 1
    m._pre_jit_cache["sentinel"] = 1
    m._step_cache["sentinel"] = 1
    m.compile(optimizer="adam", learning_rate=0.01)
    assert not m._fused_fit_cache and not m._epoch_log_cache
    assert not m._pre_jit_cache and not m._step_cache


def test_bf16_optimizer_state_on_mesh():
    """optimizer_state_dtype composes with mesh sharding: slots shard like
    their params and the trajectory tracks the unsharded bf16-state run."""
    from models_tpu.data import Dataset
    from models_tpu.models import MatrixFactorizationModel
    from models_tpu.schema import Schema, Tags, create_categorical_column

    rng = np.random.default_rng(0)
    users = rng.integers(0, 49, size=256).astype(np.int32)
    schema = Schema(
        [
            create_categorical_column("user_id", 49, tags=(Tags.USER, Tags.USER_ID)),
            create_categorical_column("item_id", 49, tags=(Tags.ITEM, Tags.ITEM_ID)),
        ]
    )
    ds = Dataset({"user_id": users, "item_id": users.copy()}, schema=schema)

    def run(mesh):
        m = MatrixFactorizationModel(schema, dim=8)
        m.compile(optimizer="adam", learning_rate=0.05,
                  optimizer_state_dtype="bfloat16")
        return m.fit(
            ds, epochs=2, batch_size=32, shuffle=False, verbose=0, mesh=mesh
        ).history["loss"]

    np.testing.assert_allclose(
        run(None), run(cpu_mesh({"data": 2, "model": 2})), rtol=1e-3
    )


def test_bf16_table_sharded_sparse_training():
    """bf16-at-rest tables x model-sharded mesh x row-sparse optimizer: the
    stochastic-rounding write runs inside the shard_map and the trajectory
    tracks the fp32-table sharded run."""
    from models_tpu.data import Dataset
    from models_tpu.models import MatrixFactorizationModel
    from models_tpu.schema import Schema, Tags, create_categorical_column

    rng = np.random.default_rng(0)
    users = rng.integers(0, 63, size=256).astype(np.int32)
    schema = Schema(
        [
            create_categorical_column("user_id", 63, tags=(Tags.USER, Tags.USER_ID)),
            create_categorical_column("item_id", 63, tags=(Tags.ITEM, Tags.ITEM_ID)),
        ]
    )
    ds = Dataset({"user_id": users, "item_id": users.copy()}, schema=schema)
    mesh = cpu_mesh({"data": 2, "model": 2})

    def run(dt):
        import jax.numpy as jnp

        m = MatrixFactorizationModel(
            schema, dim=16, table_dtype=None if dt is None else jnp.bfloat16
        )
        m.compile(optimizer="adam", learning_rate=0.5, embedding_optimizer="adagrad")
        h = m.fit(ds, epochs=4, batch_size=64, shuffle=False, verbose=0, mesh=mesh)
        return h.history["loss"]

    l32, lbf = run(None), run("bf16")
    assert lbf[-1] < lbf[0]
    np.testing.assert_allclose(lbf, l32, rtol=2e-2)
