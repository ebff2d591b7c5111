"""Retrieval hyperparameter search: tune the two-tower config against
corpus recall@k.

Mirrors ``examples/usecases/retrieval-with-hyperparameter-optimization.ipynb``
(the reference drives optuna over the LastFM two-tower; the tuned search space
— tower widths, logits temperature, learning rate, logQ correction — is
recorded in ``tests/common/tf/retrieval/retrieval_tests_common.py:26-56``).
This version uses a dependency-free random search: each trial is one
``TwoTowerModel`` trained briefly and scored with the corpus top-k evaluator;
swap the sampler for optuna/ray when available — the trial function is the
only thing they need.
"""

import numpy as np

import models_tpu as mm

train, valid = mm.data.datasets.get_movielens(variant="ml-25m", num_rows=30_000)

SPACE = {
    "tower": [(128, 64), (64, 32)],
    "embedding_dim": [32, 64],
    "logits_temperature": [0.6, 1.0, 1.4],
    "learning_rate": [0.02, 0.05, 0.1],
}


def trial(params, seed):
    model = mm.TwoTowerModel(
        train.schema,
        query_tower=params["tower"],
        embedding_dim=params["embedding_dim"],
        logits_temperature=params["logits_temperature"],
        seed=seed,
    )
    model.compile(optimizer="adagrad", learning_rate=params["learning_rate"])
    model.fit(train, epochs=1, batch_size=2048, verbose=0)
    topk = model.to_top_k_encoder(train, k=10)
    topk.compile()
    metrics = topk.evaluate(valid, batch_size=1024, return_dict=True)
    score = float(metrics["recall_at_10"])
    return score, model


rng = np.random.default_rng(3)
best = (-1.0, None, None)
for t in range(4):
    params = {k: v[rng.integers(len(v))] for k, v in SPACE.items()}
    score, model = trial(params, seed=t)
    print(f"trial {t}: recall@10={score:.4f}  {params}")
    if score > best[0]:
        best = (score, params, model)

score, params, model = best
print(f"best: recall@10={score:.4f}  {params}")

# deploy the winner: export the serving top-k index from the tuned model
topk = model.to_top_k_encoder(train, k=10)
out = topk.predict(valid, batch_size=1024)
print("top-k predictions:", np.asarray(out["ids"]).shape)
