"""BASELINE.md parity configs on structured synthetic data.

The reference publishes no absolute numbers (BASELINE.md), so parity is
demonstrated behaviorally: on data with planted latent structure every config
must learn far past chance — the same smoke contract as the reference's
integration suite (`recall_at_100-final > 0`), but with real learnability bars.
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
    return train, valid


def test_config1_mf_movielens_recall(mf_data):
    """Config 1: MatrixFactorizationModel, in-batch negatives, recall@10."""
    from models_tpu.models import MatrixFactorizationModel

    train, valid = mf_data
    model = MatrixFactorizationModel(train.schema, dim=32)
    model.compile(optimizer="adam", learning_rate=0.02)
    model.fit(train, epochs=8, batch_size=64, verbose=0)
    res = model.evaluate(valid, batch_size=64)
    # chance recall@10 with 64-candidate in-batch eval ≈ 10/64 ≈ 0.16
    assert res["recall_at_10"] > 0.35, res


def test_config2_two_tower_corpus_eval(mf_data):
    """Config 2: TwoTowerModel + BruteForce/TopKEncoder corpus eval, recall/NDCG@10."""
    from models_tpu.models import TwoTowerModel

    train, valid = mf_data
    model = TwoTowerModel(train.schema, query_tower=(32, 16), embedding_dim=16)
    model.compile(optimizer="adam", learning_rate=0.01)
    model.fit(train, epochs=8, batch_size=64, verbose=0)
    topk = model.to_top_k_encoder(train, k=10)
    topk.compile()
    res = topk.evaluate(valid, batch_size=64)
    # chance recall@10 against the full 300-item corpus = 10/300 ≈ 0.033
    assert res["recall_at_10"] > 0.10, res
    assert res["ndcg_at_10"] > 0.04, res


def _ctr_dataset(rows=4000, seed=2):
    """CTR data with a planted logistic model over embeddings of two features."""
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
    return ds.split([0.85, 0.15], seed=3)


def test_config3_dlrm_auc():
    """Config 3: DLRMModel CTR, AUC."""
    from models_tpu.models import DLRMModel

    train, valid = _ctr_dataset()
    schema = train.schema.excluding_by_name("conversion")
    model = DLRMModel(schema, embedding_dim=16, bottom_block=(16,), top_block=(32, 16))
    model.compile(optimizer="adam", learning_rate=0.01)
    model.fit(train, epochs=5, batch_size=128, verbose=0)
    res = model.evaluate(valid, batch_size=128)
    assert res["click/auc"] > 0.75, res


def test_config4_dcn_deepfm_multitask_auc():
    """Config 4: DCN-v2 + DeepFM with multi-task binary heads, AUC."""
    from models_tpu.models import DCNModel, DeepFMModel

    train, valid = _ctr_dataset(seed=4)
    dcn = DCNModel(train.schema, depth=2, deep_block=(32, 16), embedding_dim=16)
    dcn.compile(optimizer="adam", learning_rate=0.01)
    dcn.fit(train, epochs=5, batch_size=128, verbose=0)
    res = dcn.evaluate(valid, batch_size=128)
    assert res["click/auc"] > 0.72, res
    assert "conversion/auc" in res

    fm = DeepFMModel(train.schema.excluding_by_name("conversion"), embedding_dim=8,
                     deep_block=(16,))
    fm.compile(optimizer="adam", learning_rate=0.01)
    fm.fit(train, epochs=5, batch_size=128, verbose=0)
    res2 = fm.evaluate(valid, batch_size=128)
    assert res2["click/auc"] > 0.7, res2


def test_config5_session_transformer_sampled_softmax():
    """Config 5: session-based next-item transformer, sampled softmax over catalog."""
    from models_tpu.models.session import SessionBasedTransformerModel
    from models_tpu.transformer.block import GPT2Block
    from models_tpu.transforms.sequence import SequencePredictLast, SequencePredictNext

    rng = np.random.default_rng(5)
    n, L, card = 1500, 6, 120
    # first-order markov chain: next = (2*prev + 3) % card — deterministic rule
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
    assert res["recall_at_10"] > 0.5, res
