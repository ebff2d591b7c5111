import jax
import jax.numpy as jnp
import numpy as np
import pytest

from models_tpu.ops.contrastive import sampled_softmax_loss
from models_tpu.ops.embedding_lookup import sharded_lookup, sharded_update_rows
from models_tpu.ops.topk import blockwise_topk, sharded_topk, topk_scores


def test_blockwise_topk_matches_direct():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    cand = jnp.asarray(rng.standard_normal((10_000, 32)), jnp.float32)
    ref = np.sort(np.asarray(q @ cand.T), axis=1)[:, -5:][:, ::-1]
    s, i = blockwise_topk(q, cand, 5, tile=1024)
    np.testing.assert_allclose(np.asarray(s), ref, rtol=1e-4)
    # non-multiple-of-tile catalog
    s2, i2 = blockwise_topk(q, cand[:9500], 5, tile=1024)
    ref2 = np.sort(np.asarray(q @ cand[:9500].T), axis=1)[:, -5:][:, ::-1]
    np.testing.assert_allclose(np.asarray(s2), ref2, rtol=1e-4)


def test_topk_scores_with_custom_ids():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    cand = jnp.asarray(rng.standard_normal((5000, 16)), jnp.float32)
    ids = jnp.arange(5000, dtype=jnp.int32) * 7 + 3
    s, i = topk_scores(q, cand, 3, ids=ids, tile=512, prefer_pallas=False)
    direct = np.asarray(q @ cand.T)
    best_idx = np.argsort(-direct, axis=1)[:, :3]
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ids)[best_idx])


def test_sharded_topk_on_virtual_mesh():
    from models_tpu.parallel.mesh import make_mesh

    devs = jax.devices("cpu")[:4]
    mesh = make_mesh({"model": 4}, devices=devs)
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    cand = jnp.asarray(rng.standard_normal((4096, 16)), jnp.float32)
    s, i = sharded_topk(q, cand, 5, mesh, axis="model", tile=512)
    ref = np.sort(np.asarray(q @ cand.T), axis=1)[:, -5:][:, ::-1]
    np.testing.assert_allclose(np.asarray(s), ref, rtol=1e-4)


def test_sampled_softmax_loss_matches_dense():
    rng = np.random.default_rng(3)
    Q, D, N = 32, 16, 500
    q = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)
    neg = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)

    def dense_loss(q, pos, neg):
        pos_l = jnp.sum(q * pos, axis=-1, keepdims=True)
        neg_l = q @ neg.T
        logits = jnp.concatenate([pos_l, neg_l], axis=1)
        return jnp.mean(jax.nn.logsumexp(logits, axis=1) - logits[:, 0])

    expected = dense_loss(q, pos, neg)
    got = sampled_softmax_loss(q, pos, neg, None, None, None, None, 1.0, 128)
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


def test_sampled_softmax_loss_grads_match_dense():
    rng = np.random.default_rng(4)
    Q, D, N = 8, 8, 96
    q = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)
    neg = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)

    def dense_loss(q, pos, neg):
        pos_l = jnp.sum(q * pos, axis=-1, keepdims=True)
        neg_l = q @ neg.T
        logits = jnp.concatenate([pos_l, neg_l], axis=1)
        return jnp.mean(jax.nn.logsumexp(logits, axis=1) - logits[:, 0])

    def block_loss(q, pos, neg):
        return sampled_softmax_loss(q, pos, neg, None, None, None, None, 1.0, 32)

    g_ref = jax.grad(dense_loss, argnums=(0, 1, 2))(q, pos, neg)
    g_got = jax.grad(block_loss, argnums=(0, 1, 2))(q, pos, neg)
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_sampled_softmax_false_negative_masking():
    rng = np.random.default_rng(5)
    Q, D, N = 4, 8, 16
    q = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)
    neg = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    pos_id = jnp.array([1, 2, 3, 4])
    neg_id = jnp.arange(N)  # ids 1..4 collide with positives
    with_mask = sampled_softmax_loss(q, pos, neg, pos_id, neg_id, None, None, 1.0, 8)
    without = sampled_softmax_loss(q, pos, neg, None, None, None, None, 1.0, 8)
    assert float(with_mask) < float(without) + 1e-6  # masked collisions lower LSE


def test_sampled_softmax_weights():
    rng = np.random.default_rng(6)
    Q, D, N = 6, 4, 32
    q = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)
    neg = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    w = jnp.array([1, 1, 0, 0, 0, 0], jnp.float32)
    loss_w = sampled_softmax_loss(q, pos, neg, None, None, w, None, 1.0, 16)
    loss_2 = sampled_softmax_loss(q[:2], pos[:2], neg, None, None, None, None, 1.0, 16)
    np.testing.assert_allclose(float(loss_w), float(loss_2), rtol=1e-5)


def test_sharded_lookup_matches_gather():
    from models_tpu.parallel.mesh import make_mesh

    devs = jax.devices("cpu")[:4]
    mesh = make_mesh({"model": 4}, devices=devs)
    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, size=20), jnp.int32)
    out = sharded_lookup(table, ids, mesh, axis="model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(table)[np.asarray(ids)], rtol=1e-6)


def test_sharded_lookup_grad_is_scatter():
    from models_tpu.parallel.mesh import make_mesh

    devs = jax.devices("cpu")[:2]
    mesh = make_mesh({"model": 2}, devices=devs)
    table = jnp.ones((16, 4), jnp.float32)
    ids = jnp.array([0, 3, 9, 3], jnp.int32)

    def f(t):
        return jnp.sum(sharded_lookup(t, ids, mesh) * 2.0)

    g = np.asarray(jax.grad(f)(table))
    expected = np.zeros((16, 4), np.float32)
    for i in ids:
        expected[int(i)] += 2.0
    np.testing.assert_allclose(g, expected)


def test_sharded_update_rows():
    from models_tpu.parallel.mesh import make_mesh

    devs = jax.devices("cpu")[:2]
    mesh = make_mesh({"model": 2}, devices=devs)
    table = jnp.zeros((8, 4), jnp.float32)
    ids = jnp.array([1, 6, 1], jnp.int32)
    upd = jnp.ones((3, 4), jnp.float32)
    out = np.asarray(sharded_update_rows(table, ids, upd, mesh))
    assert out[1, 0] == 2.0  # duplicate id accumulated
    assert out[6, 0] == 1.0
    assert out[0, 0] == 0.0


def test_sampled_softmax_logq_bias_matches_dense():
    rng = np.random.default_rng(8)
    Q, D, N = 8, 8, 48
    q = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)
    neg = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    probs = jnp.asarray(rng.uniform(0.01, 0.2, N), jnp.float32)
    bias = -jnp.log(probs + 1e-6)

    def dense_loss(q, pos, neg):
        pos_l = jnp.sum(q * pos, axis=-1, keepdims=True)
        neg_l = q @ neg.T + bias[None, :]
        logits = jnp.concatenate([pos_l, neg_l], axis=1) / 0.7
        return jnp.mean(jax.nn.logsumexp(logits, axis=1) - logits[:, 0])

    got = sampled_softmax_loss(q, pos, neg, None, None, None, bias, 0.7, 16)
    np.testing.assert_allclose(float(got), float(dense_loss(q, pos, neg)), rtol=1e-5)
    # grads flow with bias present
    g = jax.grad(lambda qq: sampled_softmax_loss(qq, pos, neg, None, None, None, bias, 0.7, 16))(q)
    g_ref = jax.grad(lambda qq: dense_loss(qq, pos, neg))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-6)


def test_dedup_rows_segment_sums_duplicates():
    import jax.numpy as jnp

    from models_tpu.ops.scatter import dedup_rows

    ids = jnp.array([5, 2, 5, 9, 2, 2], jnp.int32)
    rows = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
    sids, summed, valid = dedup_rows(ids, rows)
    out = {}
    for i in range(6):
        if bool(valid[i]):
            out[int(sids[i])] = np.asarray(summed[i])
    np.testing.assert_allclose(out[2], rows[1] + rows[4] + rows[5])
    np.testing.assert_allclose(out[5], rows[0] + rows[2])
    np.testing.assert_allclose(out[9], rows[3])
    assert int(valid.sum()) == 3


def test_pallas_row_scatter_add_interpret_matches_numpy():
    import jax.numpy as jnp

    from models_tpu.ops.scatter import dedup_rows, pallas_row_scatter_add

    rng = np.random.default_rng(1)
    R, D, B = 64, 8, 37
    table = jnp.asarray(rng.standard_normal((R, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, R, B), jnp.int32)
    upd = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    sids, summed, valid = dedup_rows(ids, upd)
    expect = np.asarray(table).copy()
    np.add.at(expect, np.asarray(ids), np.asarray(upd))
    got = pallas_row_scatter_add(table, sids, summed, valid, block=16, n_buf=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5, atol=1e-5)
    # XLA fallback path agrees too
    got2 = pallas_row_scatter_add(table, sids, summed, valid, force_xla=True)
    np.testing.assert_allclose(np.asarray(got2), expect, rtol=1e-5, atol=1e-5)


def test_mixed_bfloat16_policy_trajectory_close():
    """bf16 matmuls with fp32 accumulation must track the fp32 loss trajectory."""
    from models_tpu.core.policy import get_dtype_policy, set_dtype_policy
    from models_tpu.data import generate_data
    from models_tpu.models import TwoTowerModel

    ds = generate_data("movielens-100k", num_rows=256)

    def run():
        m = TwoTowerModel(ds.schema, query_tower=(32, 16), embedding_dim=16)
        m.compile(optimizer="adam", learning_rate=0.05)
        h = m.fit(ds, epochs=3, batch_size=32, shuffle=False, verbose=0)
        return np.asarray(h.history["loss"])

    set_dtype_policy("float32")
    assert get_dtype_policy() == "float32"
    base = run()
    set_dtype_policy("mixed_bfloat16")
    try:
        mixed = run()
    finally:
        set_dtype_policy("float32")
    assert base[-1] < base[0]  # both learn
    assert mixed[-1] < mixed[0]
    np.testing.assert_allclose(mixed, base, rtol=5e-2)


def test_fused_loss_matches_dense_under_bf16():
    from models_tpu.core.policy import set_dtype_policy
    from models_tpu.ops.contrastive import sampled_softmax_loss

    rng = np.random.default_rng(0)
    Q, N, D = 8, 32, 16
    q = jnp.asarray(rng.standard_normal((Q, D)), jnp.bfloat16)
    pos = jnp.asarray(rng.standard_normal((Q, D)), jnp.bfloat16)
    neg = jnp.asarray(rng.standard_normal((N, D)), jnp.bfloat16)

    def fused(q, pos, neg):
        return sampled_softmax_loss(q, pos, neg, None, None, None, None, 1.0, 16)

    loss, grads = jax.value_and_grad(fused, argnums=(0, 1, 2))(q, pos, neg)
    assert grads[0].dtype == jnp.bfloat16  # cotangents match primal dtype

    def dense(q, pos, neg):
        qf, pf, nf = (a.astype(jnp.float32) for a in (q, pos, neg))
        logits = jnp.concatenate(
            [jnp.sum(qf * pf, axis=1, keepdims=True), qf @ nf.T], axis=1
        )
        return jnp.mean(jax.nn.logsumexp(logits, axis=1) - logits[:, 0])

    ref = dense(q, pos, neg)
    np.testing.assert_allclose(float(loss), float(ref), rtol=2e-2)


def test_flash_ce_kernels_match_scan_interpret():
    """Pallas flash-CE forward/backward == the XLA-scan reference path
    (interpret mode; the TPU run is covered by the bench + dispatch)."""
    import models_tpu.ops.contrastive as oc
    from models_tpu.ops import flash_ce

    rng = np.random.default_rng(0)
    Q, N, D = 20, 40, 16
    q = jnp.asarray(rng.standard_normal((Q, D)) * 0.3, jnp.float32)
    pos = jnp.asarray(rng.standard_normal((Q, D)) * 0.3, jnp.float32)
    neg = jnp.asarray(rng.standard_normal((N, D)) * 0.3, jnp.float32)
    pid = jnp.asarray(rng.integers(0, 50, Q), jnp.int32)
    nid = jnp.asarray(rng.integers(0, 50, N), jnp.int32)
    bias = jnp.asarray(rng.standard_normal(N) * 0.1, jnp.float32)
    w = jnp.asarray(rng.uniform(0.3, 1.0, Q), jnp.float32)
    T = 0.7

    def f(q, pos, neg):
        return oc.sampled_softmax_loss(q, pos, neg, pid, nid, w, bias, T, 16)

    loss_ref, grads_ref = jax.value_and_grad(f, argnums=(0, 1, 2))(q, pos, neg)

    pos_logit = jnp.einsum("qd,qd->q", q, pos) / T
    m, s = flash_ce.lse_forward(
        q, pos_logit, neg, pid, nid, bias, T, True, tq=8, tn=16, interpret=True
    )
    loss_flash = oc._loss_from_lse(pos_logit, m, s, w)
    np.testing.assert_allclose(float(loss_flash), float(loss_ref), rtol=1e-5)

    lse = m + jnp.log(s)
    gw = w / jnp.sum(w)
    dq_neg = flash_ce.grad_query(q, neg, lse, gw, pid, nid, bias, T, True,
                                 tq=8, tn=16, interpret=True)
    p_pos = jnp.exp(pos_logit - lse)
    coef_pos = gw * (p_pos - 1.0) / T
    dq = coef_pos[:, None] * pos + dq_neg
    np.testing.assert_allclose(np.asarray(dq), np.asarray(grads_ref[0]), rtol=2e-4, atol=1e-7)

    dn = flash_ce.grad_neg(q, neg, lse, gw, pid, nid, bias, T, True,
                           tq=8, tn=16, interpret=True)
    np.testing.assert_allclose(np.asarray(dn), np.asarray(grads_ref[2]), rtol=2e-4, atol=1e-7)


def test_binned_topk_matches_blockwise():
    from models_tpu.ops.topk import binned_topk, blockwise_topk

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    cand = jnp.asarray(rng.standard_normal((10_000, 16)), jnp.float32)
    s1, i1 = binned_topk(q, cand, 10)
    s2, i2 = blockwise_topk(q, cand, 10, tile=2048)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    # with custom ids
    ids = jnp.asarray(rng.permutation(10_000).astype(np.int32))
    s3, i3 = binned_topk(q, cand, 10, ids=ids)
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(ids)[np.asarray(i2)])
    # non-multiple-of-bin catalog (padded rows must never win)
    s4, i4 = binned_topk(q, cand[:9_991], 10)
    r4s, r4i = blockwise_topk(q, cand[:9_991], 10, tile=2048)
    np.testing.assert_allclose(np.asarray(s4), np.asarray(r4s), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i4), np.asarray(r4i))


def test_binned_topk_adversarial_same_bin():
    """All the global top-k packed into ONE bin: the bin-repair logic must
    still return all of them (the case an approximate binned top-k misses)."""
    from models_tpu.ops.topk import binned_topk

    C, D, K = 4_096, 8, 10
    cand = np.zeros((C, D), np.float32)
    # top-10 candidates all live in bin 3 (cols 384..393), descending scores
    for j in range(K):
        cand[3 * 128 + j, 0] = 100.0 - j
    # decoys: next-best spread across other bins
    cand[2_000, 0] = 50.0
    cand[3_000, 0] = 49.0
    q = np.zeros((2, D), np.float32)
    q[:, 0] = 1.0
    s, i = binned_topk(jnp.asarray(q), jnp.asarray(cand), K)
    np.testing.assert_allclose(np.asarray(s)[0], 100.0 - np.arange(K), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i)[0], 3 * 128 + np.arange(K))


def test_binned_topk_all_equal_scores():
    """Degenerate all-tied scores: any k ids are a valid exact top-k."""
    from models_tpu.ops.topk import binned_topk

    q = jnp.zeros((4, 8))
    cand = jnp.ones((5_000, 8))
    s, i = binned_topk(q, cand, 10)
    np.testing.assert_allclose(np.asarray(s), 0.0)
    ii = np.asarray(i)
    assert ii.shape == (4, 10)
    assert (ii >= 0).all() and (ii < 5000).all()
    assert all(len(set(row.tolist())) == 10 for row in ii)  # distinct ids


def test_binned_topk_ties_straddling_theta():
    """More theta-ties than slots: returned set must be k elements all >= theta
    with every element > theta included."""
    from models_tpu.ops.topk import binned_topk

    C, D, K = 2_048, 4, 5
    cand = np.zeros((C, D), np.float32)
    cand[10, 0] = 9.0
    cand[900, 0] = 8.0
    for c in (5, 300, 700, 1100, 1500, 1900):  # six 7.0-ties for three slots
        cand[c, 0] = 7.0
    q = np.asarray([[1.0, 0, 0, 0]], np.float32)
    s, i = binned_topk(jnp.asarray(q), jnp.asarray(cand), K)
    s = np.asarray(s)[0]
    np.testing.assert_allclose(s, [9.0, 8.0, 7.0, 7.0, 7.0])


def test_topk_scores_method_dispatch():
    from models_tpu.ops.topk import topk_scores

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    cand = jnp.asarray(rng.standard_normal((9_000, 8)), jnp.float32)
    ref_s, ref_i = topk_scores(q, cand, 5, method="blockwise", tile=2048)
    for method in ("binned", "auto"):
        s, i = topk_scores(q, cand, 5, method=method, tile=2048)
        np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))


# ---------------------------------------------------------------------------
# all_to_all sharded lookup (SOK lookup_sparse parity; SURVEY §7 kernel #1)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "shape,data_axis",
    [
        ({"data": 1, "model": 4}, None),
        ({"data": 2, "model": 2}, "data"),
        ({"data": 4, "model": 2}, "data"),
        ({"data": 2, "model": 4}, None),
    ],
)
def test_a2a_lookup_matches_take(shape, data_axis):
    from models_tpu.ops.embedding_lookup import a2a_lookup
    from models_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    R, D, B = 64, 8, 48
    table = jnp.asarray(rng.standard_normal((R, D)).astype(np.float32))
    # include shard-skewed ids (everything owned by shard 0) and boundary rows
    ids = np.concatenate([rng.integers(0, R, B - 4), [0, R - 1, 0, 1]]).astype(np.int32)
    ids = jnp.asarray(ids)
    mesh = make_mesh(shape, devices=jax.devices("cpu")[: int(np.prod(list(shape.values())))])
    out = a2a_lookup(table, ids, mesh, data_axis=data_axis)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.take(table, ids, axis=0)), rtol=1e-6
    )
    # backward: row grads land exactly as the dense gather's scatter-add
    w = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    g = jax.grad(lambda t: jnp.sum(a2a_lookup(t, ids, mesh, data_axis=data_axis) * w))(table)
    g_ref = jax.grad(lambda t: jnp.sum(jnp.take(t, ids, axis=0) * w))(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5, atol=1e-6)


def test_sharded_lookup_auto_dispatches_a2a_and_falls_back():
    from models_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"model": 4}, devices=jax.devices("cpu")[:4])
    table = jnp.arange(64, dtype=jnp.float32).reshape(16, 4)
    ids_div = jnp.array([0, 5, 9, 15, 2, 2, 7, 11], jnp.int32)  # 8 % 4 == 0 → a2a
    ids_odd = jnp.array([0, 5, 9, 15, 2], jnp.int32)  # 5 % 4 != 0 → psum fallback
    for ids in (ids_div, ids_odd):
        out = sharded_lookup(table, ids, mesh)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jnp.take(table, ids, axis=0)), rtol=1e-6
        )
    with pytest.raises(ValueError):
        sharded_lookup(table, ids_odd, mesh, strategy="a2a")


def test_sharded_row_scatter_add_unique_and_valid():
    from models_tpu.ops.embedding_lookup import sharded_row_scatter_add
    from models_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"model": 2}, devices=jax.devices("cpu")[:2])
    table = jnp.zeros((8, 4), jnp.float32)
    ids = jnp.array([1, 6, 3], jnp.int32)
    upd = jnp.ones((3, 4), jnp.float32) * jnp.array([1.0, 2.0, 3.0])[:, None]
    valid = jnp.array([True, True, False])
    out = np.asarray(sharded_row_scatter_add(table, ids, upd, valid, mesh))
    assert out[1, 0] == 1.0 and out[6, 0] == 2.0
    assert out[3, 0] == 0.0  # invalid position dropped


def test_binned_topk_bf16_sweep_matches_naive():
    """Empirical bound for binned_topk's bin_margin (ADVICE r2): sweep
    bf16-precision catalogs dense with near-ties (duplicated rows + sub-ulp
    perturbations) and require the two-phase selection to agree with the naive
    full-matmul top-k computed at the same precision."""
    from models_tpu.ops.topk import binned_topk

    k = 10
    for seed in range(8):
        rng = np.random.default_rng(seed)
        C, D, B = 4096, 32, 8
        base = rng.standard_normal((C // 4, D)).astype(np.float32)
        cand = np.repeat(base, 4, axis=0)  # exact duplicates across bins
        cand += rng.standard_normal(cand.shape).astype(np.float32) * 1e-3
        q = rng.standard_normal((B, D)).astype(np.float32)
        qb = jnp.asarray(q).astype(jnp.bfloat16).astype(jnp.float32)
        cb = jnp.asarray(cand).astype(jnp.bfloat16).astype(jnp.float32)
        s, i = binned_topk(qb, cb, k)
        naive = jnp.matmul(qb, cb.T, preferred_element_type=jnp.float32)
        s_ref, _ = jax.lax.top_k(naive, k)
        # differently-shaped einsums accumulate in different orders: scores of
        # the SAME elements differ by ~1 ulp. The selection must agree to
        # within that rounding — no element materially better than the k-th
        # may be missed (this bounds the margin bin_margin must absorb).
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)
        # and the selected ids' NAIVE scores must reproduce the naive top-k
        sel = np.take_along_axis(np.asarray(naive), np.asarray(i), axis=1)
        np.testing.assert_allclose(
            -np.sort(-sel, axis=1), np.asarray(s_ref), rtol=1e-6
        )


def test_a2a_lookup_out_of_range_ids_contribute_zero():
    """Regression: padding sentinels / negatives must return zero rows AND
    zero cotangents (the psum path's documented miss semantics) — unmasked
    they bucket to a clamped owner and read/backprop an arbitrary row of the
    last shard."""
    from models_tpu.ops.embedding_lookup import a2a_lookup, sharded_lookup
    from models_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    R, D, B = 32, 4, 16
    table = jnp.asarray(rng.standard_normal((R, D)).astype(np.float32))
    ids_np = rng.integers(0, R, B).astype(np.int32)
    ids_np[1], ids_np[5], ids_np[9] = -1, R, R + 7  # miss slots
    ids = jnp.asarray(ids_np)
    mesh = make_mesh({"model": 4}, devices=jax.devices("cpu")[:4])

    valid = (ids_np >= 0) & (ids_np < R)
    ref = np.take(np.asarray(table), np.where(valid, ids_np, 0), axis=0)
    ref[~valid] = 0.0

    out = a2a_lookup(table, ids, mesh)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)

    # grads: miss slots contribute nothing anywhere in the table
    w = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    g = jax.grad(lambda t: jnp.sum(a2a_lookup(t, ids, mesh) * w))(table)
    g_ref = jax.grad(
        lambda t: jnp.sum(
            jnp.take(t, jnp.where(jnp.asarray(valid), ids, 0), axis=0)
            * w * jnp.asarray(valid)[:, None]
        )
    )(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5, atol=1e-6)

    # and the psum fallback agrees (B=15 not divisible by 4 → psum path)
    out_psum = sharded_lookup(table, ids[:15], mesh)
    np.testing.assert_allclose(np.asarray(out_psum), ref[:15], rtol=1e-6)


def test_stochastic_round_exact_and_unbiased():
    import jax

    from models_tpu.ops.scatter import stochastic_round

    # representable values round exactly under any key
    exact = jnp.asarray([0.0, 1.0, -2.5, 0.15625], jnp.float32)  # bf16-exact
    out = stochastic_round(exact, jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(out, np.float32), np.asarray(exact))
    assert out.dtype == jnp.bfloat16

    # unbiased in expectation: mean over many iid roundings ~= the fp32 value
    x = jnp.full((200_000,), 1.0039, jnp.float32)  # between bf16 neighbours
    r = stochastic_round(x, jax.random.key(7)).astype(jnp.float32)
    vals = set(np.unique(np.asarray(r)))
    assert len(vals) == 2  # rounds to the two neighbours only
    np.testing.assert_allclose(float(r.mean()), 1.0039, atol=2e-4)

    # non-finite values pass through (mantissa noise must not corrupt them)
    odd = jnp.asarray([np.inf, -np.inf, np.nan, 1.0], jnp.float32)
    ro = stochastic_round(odd, jax.random.key(11))
    assert np.isposinf(np.asarray(ro, np.float32)[0])
    assert np.isneginf(np.asarray(ro, np.float32)[1])
    assert np.isnan(np.asarray(ro, np.float32)[2])


def test_pallas_row_scatter_write_matches_numpy():
    import jax

    from models_tpu.ops.scatter import pallas_row_scatter_write

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((64, 8)), jnp.bfloat16)
    ids = jnp.asarray([3, 9, 3, 17], jnp.int32)     # id 3 repeated: 2nd invalid
    valid = jnp.asarray([True, True, False, True])
    rows = jnp.asarray(rng.standard_normal((4, 8)), jnp.bfloat16)

    want = np.asarray(table, np.float32)
    for j in range(4):
        if bool(valid[j]):
            want[int(ids[j])] = np.asarray(rows[j], np.float32)

    for kw in ({"interpret": True, "block": 4, "n_buf": 2}, {"force_xla": True}):
        got = pallas_row_scatter_write(table, ids, rows, valid, **kw)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(got, np.float32), want)


def test_scatter_write_16bit_block_merge_cases():
    """Regression (v5e Mosaic): 16-bit tables scatter through aligned 8-row
    block RMW (single-row 16-bit DMA slices fail tiling alignment; the uint32
    pair view materializes 64x lane-padded on the AOT compiler), so untouched
    rows of each touched block must be merged back exactly. Covers: several
    writes landing in ONE block, block-boundary rows, invalid lanes, duplicate
    ids (dedup convention: only the run start valid), and unsorted inputs."""
    from models_tpu.ops.scatter import pallas_row_scatter_write

    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((32, 8)), jnp.bfloat16)
    #     same-block trio   block edge  lone   dup(invalid)  invalid-garbage
    ids = jnp.asarray([7, 6, 0, 15, 16, 20, 7, 999_999], jnp.int32)
    valid = jnp.asarray([True, True, True, True, True, True, False, False])
    rows = jnp.asarray(rng.standard_normal((8, 8)), jnp.bfloat16)

    want = np.asarray(table, np.float32)
    for j in range(6):
        want[int(ids[j])] = np.asarray(rows[j], np.float32)

    got = pallas_row_scatter_write(
        table, ids, rows, valid, block=4, n_buf=2, interpret=True
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(got, np.float32), want)


def test_scatter_add_16bit_delegates_to_write():
    """bf16 scatter-add routes via gather + pair-write (Mosaic can't compile
    the fp32 RMW pipeline on sub-fp32 VMEM buffers)."""
    from models_tpu.ops.scatter import pallas_row_scatter_add

    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.standard_normal((16, 8)), jnp.bfloat16)
    ids = jnp.asarray([4, 5, 9], jnp.int32)
    upd = jnp.asarray(rng.standard_normal((3, 8)), jnp.float32)
    want = np.asarray(table, np.float32)
    for j in range(3):
        want[int(ids[j])] = np.float32(
            jnp.asarray(want[int(ids[j])] + np.asarray(upd[j]), jnp.bfloat16)
        )
    got = pallas_row_scatter_add(table, ids, upd, None, block=4, n_buf=2, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), want, rtol=0.02, atol=0.02)


def test_sampled_softmax_invalid_negative_with_huge_score_suppressed():
    """Regression (review): the fused path must EXCLUDE invalid (padded)
    negatives exactly — an additive MIN_FLOAT bias leaks rows whose raw dot
    exceeds |MIN_FLOAT|. The engine zeroes invalid embeddings and pins their
    bias to MIN_FLOAT; this asserts that construction equals true exclusion."""
    from models_tpu.core.constants import MIN_FLOAT

    rng = np.random.default_rng(0)
    Q, N, D = 8, 16, 32
    q = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32) * 10.0
    pos = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)
    neg = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    # make the LAST negative a monster: raw dots ~ +3200 >> |MIN_FLOAT|
    neg = neg.at[-1].set(q.sum(axis=0) * 4.0)
    valid = jnp.arange(N) < N - 1

    # engine construction for invalid rows (contrastive.py fused path)
    neg_masked = jnp.where(valid[:, None], neg, 0.0)
    bias = jnp.where(valid, 0.0, MIN_FLOAT)
    got = sampled_softmax_loss(q, pos, neg_masked, None, None, None, bias, 1.0, 8)
    want = sampled_softmax_loss(q, pos, neg[:-1], None, None, None, None, 1.0, 8)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_sampled_softmax_bias_and_weights_are_gradient_constants():
    """Documented contract: logQ biases / sample weights take no gradient
    through the fused loss (stop_gradient at entry, uniform across the scan
    and flash paths)."""
    rng = np.random.default_rng(1)
    Q, N, D = 4, 8, 16
    q = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)
    neg = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    nb = jnp.asarray(rng.standard_normal((N,)), jnp.float32)
    pb = jnp.asarray(rng.standard_normal((Q,)), jnp.float32)
    w = jnp.abs(jnp.asarray(rng.standard_normal((Q,)), jnp.float32))

    g_nb, g_pb, g_w = jax.grad(
        lambda nb_, pb_, w_: sampled_softmax_loss(
            q, pos, neg, None, None, w_, nb_, 1.0, 8, pos_bias=pb_
        ),
        argnums=(0, 1, 2),
    )(nb, pb, w)
    assert float(jnp.abs(g_nb).max()) == 0.0
    assert float(jnp.abs(g_pb).max()) == 0.0
    assert float(jnp.abs(g_w).max()) == 0.0
    # ...while the embedding gradient is real
    g_q = jax.grad(
        lambda q_: sampled_softmax_loss(q_, pos, neg, None, None, w, nb, 1.0, 8, pos_bias=pb)
    )(q)
    assert float(jnp.abs(g_q).max()) > 0.0


def test_pallas_gather_interpret_fp32_padding_and_duplicates():
    """pallas_gather (fp32, interpret mode): duplicate ids, ids forcing block
    padding (B not a multiple of block), and full coverage vs jnp.take
    (ADVICE r3: the kernel had no unit test at all)."""
    from models_tpu.ops.embedding_lookup import pallas_gather

    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)
    ids = jnp.asarray([0, 63, 7, 7, 7, 12, 1], jnp.int32)  # B=7 pads to block
    got = pallas_gather(table, ids, block=4, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(jnp.take(table, ids, axis=0))
    )


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16])
def test_pallas_gather_interpret_16bit_block_select(dtype):
    """The 16-bit gather DMAs the aligned 8-row block containing each id and
    selects the row on the VPU (Mosaic rejects single-row 16-bit DMA slices)
    — interpret mode takes the SAME branch as the chip so an indexing bug
    shows up off-TPU (ADVICE r3). Covers block boundaries, all in-block
    offsets, and duplicates."""
    from models_tpu.ops.embedding_lookup import pallas_gather

    rng = np.random.default_rng(4)
    table = jnp.asarray(rng.standard_normal((32, 8)), dtype)
    ids = jnp.asarray([0, 1, 30, 31, 7, 8, 7, 16, 23, 9], jnp.int32)
    got = pallas_gather(table, ids, block=4, interpret=True)
    assert got.dtype == dtype
    np.testing.assert_array_equal(
        np.asarray(got, np.float32),
        np.asarray(jnp.take(table, ids, axis=0), np.float32),
    )


def test_pallas_gather_16bit_odd_shapes():
    """Row counts not divisible by 8 fall back to a plain XLA gather; odd
    feature dims are fine (the block path has no width constraint)."""
    from models_tpu.ops.embedding_lookup import pallas_gather

    rng = np.random.default_rng(5)
    for shape in ((33, 8), (32, 7)):
        table = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        ids = jnp.asarray([0, shape[0] - 1, 3], jnp.int32)
        got = pallas_gather(table, ids, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(got, np.float32),
            np.asarray(jnp.take(table, ids, axis=0), np.float32),
        )


def test_scatter_write_fp32_narrow_rows_xla_route():
    """Tables with D % 128 != 0 (criteo-native D=64) cannot take ANY Pallas
    route — Mosaic's lane tiling rejects dynamic slices whose last dim isn't
    a multiple of 128, including aligned (8, 64) blocks (chip-verified, r5).
    They route through XLA scatter with a globally-unique index vector
    (invalid lanes remapped to distinct OOB slots). Unsorted ids, duplicates
    among invalid lanes, garbage ids."""
    from models_tpu.ops.scatter import pallas_row_scatter_write

    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.standard_normal((40, 24)), jnp.float32)
    ids = jnp.asarray([9, 8, 31, 32, 5, 9, 123_456], jnp.int32)
    valid = jnp.asarray([True, True, True, True, True, False, False])
    rows = jnp.asarray(rng.standard_normal((7, 24)), jnp.float32)

    want = np.array(table)
    for j in range(5):
        want[int(ids[j])] = np.asarray(rows[j])

    got = pallas_row_scatter_write(
        table, ids, rows, valid, block=4, n_buf=2, interpret=True
    )
    assert got.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(got), want)


def test_scatter_add_fp32_narrow_rows_exact():
    """fp32 scatter-ADD with D % 128 != 0 goes straight to XLA scatter-add
    with unique indices (no Pallas route compiles for narrow rows — Mosaic
    lane tiling); the add runs in fp32 so the result is bit-exact vs numpy
    applying the same dedup-then-add order."""
    from models_tpu.ops.scatter import dedup_rows, pallas_row_scatter_add

    rng = np.random.default_rng(8)
    table = jnp.asarray(rng.standard_normal((24, 40)), jnp.float32)
    raw_ids = jnp.asarray([3, 17, 3, 8, 17, 17], jnp.int32)  # duplicates
    raw_upd = jnp.asarray(rng.standard_normal((6, 40)), jnp.float32)
    sids, summed, valid = dedup_rows(raw_ids, raw_upd)

    want = np.array(table)
    for j in range(6):
        want[int(raw_ids[j])] += np.asarray(raw_upd[j])

    got = pallas_row_scatter_add(
        table, sids, summed, valid, block=4, n_buf=2, interpret=True
    )
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_binned_topk_padded_index_exact():
    """The padded-at-build-time path (n_valid masking, r5): results must match
    the unpadded kernel exactly — padding rows can never be emitted, even when
    their zero-dot score would rank (negative-score catalogs)."""
    from models_tpu.ops.topk import binned_topk

    rng = np.random.default_rng(11)
    C, D, B, k = 1000, 16, 8, 5
    # all-negative scores: zero padding rows would WIN without masking
    cand = jnp.asarray(-np.abs(rng.standard_normal((C, D))).astype(np.float32))
    q = jnp.asarray(np.abs(rng.standard_normal((B, D))).astype(np.float32))
    ids = jnp.arange(C, dtype=jnp.int32) * 3 + 1

    s_ref, i_ref = binned_topk(q, cand, k, ids=ids, bin_size=64)
    pad = (-C) % 64
    cand_p = jnp.pad(cand, ((0, pad), (0, 0)))
    ids_p = jnp.pad(ids, (0, pad), constant_values=-1)
    s_pad, i_pad = binned_topk(q, cand_p, k, ids=ids_p, bin_size=64, n_valid=C)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_pad), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_pad))
    assert (np.asarray(i_pad) >= 0).all()


def test_brute_force_index_pads_and_masks():
    """BruteForce.index pads the stored matrix to a bin multiple; queries and
    score_all still behave as if only the real candidates exist."""
    from models_tpu.outputs.topk import BruteForce

    rng = np.random.default_rng(12)
    C, D = 300, 8
    cand = -np.abs(rng.standard_normal((C, D))).astype(np.float32)
    from models_tpu.ops.topk import _BINNED_BIN_SIZE

    bf = BruteForce(k=4).index(jnp.asarray(cand))
    assert bf.num_candidates == C
    assert bf.candidates.value.shape[0] % _BINNED_BIN_SIZE == 0
    assert bf.candidates.value.shape[0] >= C
    q = jnp.asarray(np.abs(rng.standard_normal((6, D))).astype(np.float32))
    pred = bf(q)
    assert (np.asarray(pred.identifiers) < C).all()
    assert (np.asarray(pred.identifiers) >= 0).all()
    scores, ids = bf.score_all(q)
    assert scores.shape == (6, C) and ids.shape == (C,)


def test_binned_rescore_kernel_interpret_parity():
    """The opt-in Pallas gather-dot rescore must match the XLA gather+einsum
    pool exactly (interpret mode; covers non-multiple-of-8 batches)."""
    from models_tpu.ops.topk import _binned_rescore

    rng = np.random.default_rng(0)
    for B in (8, 13):
        D, kb, bs, L = 128, 5, 128, 40
        cand = jnp.asarray(rng.standard_normal((L * bs, D)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, L, size=(B, kb)).astype(np.int32))
        pool = _binned_rescore(q, cand, idx, bs, interpret=True)
        ref = np.einsum(
            "bd,bksd->bks", np.asarray(q),
            np.asarray(cand).reshape(L, bs, D)[np.asarray(idx)],
        ).reshape(B, kb * bs)
        np.testing.assert_allclose(np.asarray(pool), ref, rtol=1e-5, atol=1e-5)


def test_int8_index_exact_wrt_quantized_scores():
    """int8 index (r5 'beyond parity' serving feature): the binned kernel runs
    int8 x int8 integer dots (queries row-quantized on the fly), so ranking is
    BIT-exact w.r.t. the fully-quantized scoring function
    (qi · ci) * qscale_b * cscale_c — integer dots have no ulp caveat."""
    from models_tpu.ops.topk import binned_topk

    rng = np.random.default_rng(21)
    C, D, B, k = 2000, 16, 8, 5
    cand = rng.standard_normal((C, D)).astype(np.float32)
    qf = rng.standard_normal((B, D)).astype(np.float32)
    q = jnp.asarray(qf)
    # quantize exactly like BruteForce.index(dtype=int8) / binned_topk queries
    def quant(m):
        amax = np.abs(m).max(axis=1)
        sc = np.where(amax > 0, amax, 1.0) / 127.0
        return np.clip(np.round(m / sc[:, None]), -127, 127).astype(np.int8), sc

    ci8, scales = quant(cand)
    qi8, qsc = quant(qf)
    ref = (qi8.astype(np.int64) @ ci8.T.astype(np.int64)).astype(np.float64)
    ref = ref * qsc[:, None] * scales[None, :]

    s, i = binned_topk(
        q, jnp.asarray(ci8), k, bin_size=64, col_scale=jnp.asarray(scales)
    )
    ref_idx = np.argsort(-ref, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(np.asarray(i), ref_idx)
    np.testing.assert_allclose(
        np.asarray(s), np.take_along_axis(ref, ref_idx, axis=1), rtol=1e-5
    )
    # blockwise path (float-convert fallback, used by tiny mesh shards) scores
    # with FLOAT queries — a slightly different quantized function, so compare
    # as top-k overlap rather than bitwise
    s2, i2 = topk_scores(
        q, jnp.asarray(ci8), k, method="blockwise", tile=512,
        col_scale=jnp.asarray(scales),
    )
    overlap = np.mean([
        len(set(a) & set(b)) / k for a, b in zip(np.asarray(i2), ref_idx)
    ])
    assert overlap >= 0.9, overlap


def test_brute_force_int8_index_recall():
    """BruteForce.index(dtype=int8) end-to-end: padding composes, score_all
    dequantizes, and recall@10 vs the fp32 index stays >= 0.95 on unit-normal
    data (the per-row 127-level rounding moves scores by ~0.5%)."""
    from models_tpu.outputs.topk import BruteForce

    rng = np.random.default_rng(22)
    C, D, B, k = 3000, 32, 64, 10
    cand = rng.standard_normal((C, D)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

    bf32 = BruteForce(k=k).index(jnp.asarray(cand))
    bf8 = BruteForce(k=k).index(jnp.asarray(cand), dtype=jnp.int8)
    assert bf8.candidates.value.dtype == jnp.int8
    assert bf8.scales.value.shape[0] == bf8.candidates.value.shape[0]
    ids32 = np.asarray(bf32(q).identifiers)
    ids8 = np.asarray(bf8(q).identifiers)
    assert (ids8 >= 0).all() and (ids8 < C).all()  # padding never emitted
    recall = np.mean([
        len(set(a) & set(b)) / k for a, b in zip(ids32, ids8)
    ])
    assert recall >= 0.95, recall
    # score_all dequantizes: full matrix close to fp32 scoring (the int8
    # index is norm-sorted, so align columns by the returned ids first)
    s8, ids8_all = bf8.score_all(q)
    s32, ids32_all = bf32.score_all(q)
    inv = np.argsort(np.asarray(ids8_all))
    s8_aligned = np.asarray(s8)[:, inv][:, np.asarray(ids32_all)]
    err = np.abs(s8_aligned - np.asarray(s32)).max()
    scale_bound = np.abs(np.asarray(q)).sum(axis=1).max() * scales_max(cand)
    assert err <= scale_bound, (err, scale_bound)


def scales_max(cand):
    return (np.abs(cand).max(axis=1) / 127.0).max() * 0.5 + 1e-6


def test_sharded_topk_int8_col_scale():
    """Row-sharded int8 index: col_scale shards with the candidates and the
    merged result matches single-device dequantized scoring."""
    from models_tpu.parallel.mesh import make_mesh
    from models_tpu.ops.topk import binned_topk

    devs = jax.devices("cpu")[:4]
    mesh = make_mesh({"model": 4}, devices=devs)
    rng = np.random.default_rng(23)
    q = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    cand = rng.standard_normal((4096, 16)).astype(np.float32)
    amax = np.abs(cand).max(axis=1)
    scales = np.where(amax > 0, amax, 1.0) / 127.0
    ci8 = np.clip(np.round(cand / scales[:, None]), -127, 127).astype(np.int8)
    s, i = sharded_topk(
        q, jnp.asarray(ci8), 5, mesh, axis="model", tile=512,
        col_scale=jnp.asarray(scales),
    )
    # per-shard binned kernels quantize the (replicated) queries identically,
    # so the merged result matches the fully-quantized integer scoring
    qf = np.asarray(q)
    q_amax = np.abs(qf).max(axis=1)
    qsc = np.where(q_amax > 0, q_amax, 1.0) / 127.0
    qi8 = np.clip(np.round(qf / qsc[:, None]), -127, 127).astype(np.int8)
    ref = (qi8.astype(np.int64) @ ci8.T.astype(np.int64)).astype(np.float64)
    ref = ref * qsc[:, None] * scales[None, :]
    ref_idx = np.argsort(-ref, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(np.asarray(i), ref_idx)


def test_binned_topk_per_bin_scale_matches_per_row():
    """col_scale_per_bin=True (the bin-quantized int8 fast path: int32 phase A
    inside the conv fusion, dequant on the tiny (B, L) bin-max) must return
    exactly what the per-row col_scale path returns when the scales ARE
    bin-constant — both are exact integer scorings of the same function."""
    from models_tpu.ops.topk import binned_topk

    rng = np.random.default_rng(31)
    C, D, B, k, bs = 4096, 16, 8, 5, 64
    cand = rng.standard_normal((C, D)).astype(np.float32)
    amax = np.abs(cand).max(axis=1)
    bin_scale = amax.reshape(-1, bs).max(axis=1) / 127.0
    scales = np.repeat(bin_scale, bs)
    ci8 = np.clip(np.round(cand / scales[:, None]), -127, 127).astype(np.int8)
    q = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)

    s1, i1 = binned_topk(q, jnp.asarray(ci8), k, bin_size=bs,
                         col_scale=jnp.asarray(scales))
    s2, i2 = binned_topk(q, jnp.asarray(ci8), k, bin_size=bs,
                         col_scale=jnp.asarray(scales), col_scale_per_bin=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_brute_force_int8_bin_quantized_layout():
    """BruteForce.index(dtype=int8) norm-sorts rows and shares one scale per
    bin (scales bin-constant); ids follow the permutation so predictions
    map back to original identifiers."""
    from models_tpu.ops.topk import _BINNED_BIN_SIZE
    from models_tpu.outputs.topk import BruteForce

    rng = np.random.default_rng(32)
    C, D = 1000, 16
    cand = (rng.standard_normal((C, D)) * (1 + np.arange(C))[:, None] / C
            ).astype(np.float32)
    bf = BruteForce(k=5).index(jnp.asarray(cand), dtype=jnp.int8)
    assert bf.scales_per_bin
    sc = np.asarray(bf.scales.value).reshape(-1, _BINNED_BIN_SIZE)
    np.testing.assert_array_equal(sc, np.broadcast_to(sc[:, :1], sc.shape))
    # rows norm-sorted ascending over the REAL rows
    ci = np.asarray(bf.candidates.value)
    ids = np.asarray(bf.ids.value)
    real = ids >= 0
    dequant = ci[real].astype(np.float32) * np.asarray(bf.scales.value)[real, None]
    norms = np.abs(dequant).max(axis=1)
    assert (np.diff(norms) > -0.02).all()  # ascending up to quantization jitter
    assert sorted(ids[real].tolist()) == list(range(C))  # a permutation
    # end-to-end: dequantized rows reconstruct the originals (bin scale error)
    recon_err = np.abs(dequant - cand[ids[real]]).max()
    assert recon_err <= np.abs(cand).max() / 127.0 * 0.5 + 1e-6, recon_err


def test_brute_force_int8_mesh_bin_quantized_agreement():
    """Mesh int8: when shards are bin multiples the index bin-quantizes and
    the row-sharded serving result matches the single-device index exactly
    (same quantization, same ids)."""
    import jax
    from models_tpu.ops.topk import _BINNED_BIN_SIZE
    from models_tpu.outputs.topk import BruteForce
    from models_tpu.parallel.mesh import make_mesh

    devs = jax.devices("cpu")[:4]
    mesh = make_mesh({"model": 4}, devices=devs)
    rng = np.random.default_rng(33)
    C, D = 4 * _BINNED_BIN_SIZE * 4, 16  # shards are whole bins
    cand = rng.standard_normal((C, D)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((16, D)), jnp.float32)

    bf_mesh = BruteForce(k=5).index(jnp.asarray(cand), mesh=mesh, dtype=jnp.int8)
    assert bf_mesh.scales_per_bin
    bf_one = BruteForce(k=5).index(jnp.asarray(cand), dtype=jnp.int8)
    p_mesh, p_one = bf_mesh(q), bf_one(q)
    np.testing.assert_array_equal(
        np.asarray(p_mesh.identifiers), np.asarray(p_one.identifiers)
    )
    np.testing.assert_allclose(
        np.asarray(p_mesh.scores), np.asarray(p_one.scores), rtol=1e-6
    )
    # non-bin-aligned shards fall back to per-row scales, still correct
    bf_row = BruteForce(k=5).index(
        jnp.asarray(cand[: 4 * 96]), mesh=mesh, dtype=jnp.int8
    )  # 96 rows/shard: not a bin multiple
    assert not bf_row.scales_per_bin
    ids = np.asarray(bf_row(q).identifiers)
    assert (ids >= 0).all() and (ids < 4 * 96).all()
