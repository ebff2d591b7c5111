"""CPU baseline adapters: implicit (ALS/BPR) and LightFM
(reference ``merlin/models/implicit/__init__.py:40-217`` and
``merlin/models/lightfm/__init__.py:41``).

The Dataset → sparse user-item matrix conversion is pure numpy/scipy and always
available; the model classes require the optional libraries and raise a clear
ImportError otherwise.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from .data.dataset import Dataset
from .schema import Schema, Tags


def dataset_to_coo(dataset: Dataset, schema: Optional[Schema] = None,
                   value_column: Optional[str] = None):
    """(user, item[, value]) rows → scipy COO interaction matrix."""
    from scipy.sparse import coo_matrix

    schema = schema or dataset.schema
    cols = dataset.to_numpy_dict()
    user_col = schema.user_id_column
    item_col = schema.item_id_column
    users = cols[user_col.name].astype(np.int64)
    items = cols[item_col.name].astype(np.int64)
    if value_column and value_column in cols:
        vals = cols[value_column].astype(np.float32)
    else:
        vals = np.ones(len(users), np.float32)
    shape = (user_col.cardinality, item_col.cardinality)
    return coo_matrix((vals, (users, items)), shape=shape)


class _TopKEvalMixin:
    def evaluate(self, dataset: Dataset, k: int = 10) -> Dict[str, float]:
        """Per-user Recall@k / Precision@k against held-out interactions."""
        coo = dataset_to_coo(dataset, self.schema).tocsr()
        users = np.unique(coo.nonzero()[0])
        recalls, precisions = [], []
        for u in users:
            true_items = set(coo[u].indices.tolist())
            if not true_items:
                continue
            ids, _ = self.predict_user(int(u), k)
            hits = len(set(ids.tolist()) & true_items)
            recalls.append(hits / len(true_items))
            precisions.append(hits / k)
        return {
            f"recall_at_{k}": float(np.mean(recalls)) if recalls else 0.0,
            f"precision_at_{k}": float(np.mean(precisions)) if precisions else 0.0,
        }


class ImplicitModel(_TopKEvalMixin):
    """ALS / BPR via the ``implicit`` library."""

    def __init__(self, schema: Schema, algo: str = "als", **params):
        try:
            import implicit  # noqa
        except ImportError as e:
            raise ImportError("the 'implicit' library is not installed") from e
        import implicit

        self.schema = schema
        cls = {
            "als": implicit.als.AlternatingLeastSquares,
            "bpr": implicit.bpr.BayesianPersonalizedRanking,
        }[algo]
        self.model = cls(**params)
        self._user_items = None

    def fit(self, dataset: Dataset):
        self._user_items = dataset_to_coo(dataset, self.schema).tocsr()
        self.model.fit(self._user_items)
        return self

    def predict_user(self, user_id: int, k: int = 10):
        ids, scores = self.model.recommend(
            user_id, self._user_items[user_id], N=k, filter_already_liked_items=False
        )
        return np.asarray(ids), np.asarray(scores)


class LightFMModel(_TopKEvalMixin):
    """LightFM (WARP/BPR) adapter."""

    def __init__(self, schema: Schema, loss: str = "warp", **params):
        try:
            from lightfm import LightFM  # noqa
        except ImportError as e:
            raise ImportError("the 'lightfm' library is not installed") from e
        from lightfm import LightFM

        self.schema = schema
        self.model = LightFM(loss=loss, **params)
        self._num_items = schema.item_id_column.cardinality

    def fit(self, dataset: Dataset, epochs: int = 10):
        coo = dataset_to_coo(dataset, self.schema)
        self.model.fit(coo, epochs=epochs)
        return self

    def predict_user(self, user_id: int, k: int = 10):
        items = np.arange(self._num_items)
        scores = self.model.predict(user_id, items)
        top = np.argsort(-scores)[:k]
        return top, scores[top]
