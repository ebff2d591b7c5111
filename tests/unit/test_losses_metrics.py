import jax
import jax.numpy as jnp
import numpy as np
import pytest

from models_tpu import losses
from models_tpu.metrics.topk import (
    average_precision_at,
    extract_topk,
    mrr_at,
    ndcg_at,
    precision_at,
    recall_at,
)


def test_binary_crossentropy_matches_manual():
    logits = jnp.array([0.5, -1.0, 2.0])
    labels = jnp.array([1.0, 0.0, 1.0])
    expected = -np.mean(
        np.asarray(labels) * np.log(1 / (1 + np.exp(-np.asarray(logits))))
        + (1 - np.asarray(labels)) * np.log(1 - 1 / (1 + np.exp(-np.asarray(logits))))
    )
    got = float(losses.binary_crossentropy(labels, logits))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_categorical_vs_sparse_equivalence():
    logits = jnp.asarray(np.random.randn(4, 6), jnp.float32)
    ids = jnp.array([0, 3, 5, 2])
    onehot = jax.nn.one_hot(ids, 6)
    a = float(losses.categorical_crossentropy(onehot, logits))
    b = float(losses.sparse_categorical_crossentropy(ids, logits))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_pairwise_losses_prefer_ranked_correctly():
    """All pairwise losses must be lower when the positive outranks negatives."""
    good = jnp.array([[5.0, 1.0, 0.0, -1.0]])  # pos col 0 high
    bad = jnp.array([[-5.0, 1.0, 0.0, -1.0]])  # pos col 0 low
    for name in ("bpr", "bpr-max", "top1", "top1_v2", "top1_max", "logistic", "hinge"):
        fn = losses.get_loss(name)
        lg, lb = float(fn(None, good)), float(fn(None, bad))
        assert lg < lb, f"{name}: {lg} !< {lb}"


def test_pairwise_loss_gradients_finite():
    logits = jnp.asarray(np.random.randn(8, 5), jnp.float32)
    for name in ("bpr", "bpr-max", "top1", "top1_max", "logistic", "hinge"):
        fn = losses.get_loss(name)
        g = jax.grad(lambda l: fn(None, l))(logits)
        assert np.isfinite(np.asarray(g)).all(), name


def test_topk_metric_math():
    # 2 rows, k=4; row0 has relevant items at ranks 1 and 3; row1 none in top-k
    rel = jnp.array([[1.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 0.0]])
    num_rel = jnp.array([2.0, 1.0])
    np.testing.assert_allclose(recall_at(4, rel, num_rel), [1.0, 0.0])
    np.testing.assert_allclose(precision_at(4, rel, num_rel), [0.5, 0.0])
    np.testing.assert_allclose(mrr_at(4, rel, num_rel), [1.0, 0.0])
    # AP = (1/1 + 2/3) / 2
    np.testing.assert_allclose(
        average_precision_at(4, rel, num_rel), [(1.0 + 2.0 / 3.0) / 2.0, 0.0], rtol=1e-6
    )
    # NDCG: dcg = 1 + 1/log2(4); idcg = 1 + 1/log2(3)
    dcg = 1.0 + 1.0 / np.log2(4)
    idcg = 1.0 + 1.0 / np.log2(3)
    np.testing.assert_allclose(ndcg_at(4, rel, num_rel), [dcg / idcg, 0.0], rtol=1e-6)


def test_extract_topk_orders_and_gathers():
    scores = jnp.array([[0.1, 0.9, 0.5, 0.3]])
    targets = jnp.array([[0.0, 1.0, 0.0, 1.0]])
    top_scores, rel, idx = extract_topk(2, scores, targets, shuffle_ties=False)
    np.testing.assert_array_equal(np.asarray(idx), [[1, 2]])
    np.testing.assert_array_equal(np.asarray(rel), [[1.0, 0.0]])


def test_weighted_mean_broadcasting():
    vals = jnp.ones((4, 3))
    w = jnp.array([1.0, 1.0, 0.0, 0.0])
    got = float(losses._weighted_mean(vals * jnp.arange(3), w))
    np.testing.assert_allclose(got, 1.0)  # mean of [0,1,2] rows 0-1


def test_extract_topk_tie_shuffle_unbiased_across_batches():
    """Constant scores + target always at column 0: per-call tie shuffling must
    give recall@k ~= k/N on average, not 0 or 1 deterministically (a fixed
    tie-break key makes every batch reuse one permutation)."""
    import jax.numpy as jnp

    from models_tpu.metrics.topk import extract_topk, recall_at

    N, k, batches = 100, 10, 80
    rng = np.random.default_rng(0)
    hits = []
    for b in range(batches):
        scores = jnp.ones((4, N))  # identical constant scores across batches
        cols = rng.integers(0, N, size=4)  # realistic: targets differ per batch
        targets = jnp.zeros((4, N)).at[np.arange(4), cols].set(1.0)
        _, rel, _ = extract_topk(k, scores, targets)
        hits.append(np.asarray(recall_at(k, rel, jnp.ones(4))))
    mean_recall = float(np.mean(hits))
    # per-batch shuffling → mean ~ k/N = 0.1 (a fixed permutation pins each
    # target column to recall 0 or 1 and drifts the mean arbitrarily)
    assert 0.04 < mean_recall < 0.2, f"biased tie handling: {mean_recall}"
    assert len({float(h.mean()) for h in hits}) > 1
