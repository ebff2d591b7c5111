"""XGBoost adapter (reference ``merlin/models/xgb/__init__.py:36-409``).

Schema-driven (X, y, qid) conversion + train/evaluate/predict behind the
MerlinModel protocol. XGBoost itself is optional; the conversion utilities are
pure numpy and always available (and tested without the library).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .data.dataset import Dataset
from .schema import Schema, Tags


def dataset_to_xy(
    dataset: Dataset,
    schema: Optional[Schema] = None,
    target_column: Optional[str] = None,
    qid_column: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray], List[str]]:
    """Flatten a Dataset into (X, y, qid, feature_names). List columns are
    mean-pooled; the qid column (ranking objectives) defaults to USER_ID."""
    schema = schema or dataset.schema
    cols = dataset.to_numpy_dict()
    target_column = target_column or (
        schema.targets.first.name if len(schema.targets) else None
    )
    if target_column is None:
        raise ValueError("No TARGET column found for XGBoost training")

    feature_names = []
    features = []
    for col in schema:
        if col.name == target_column or col.has_tag(Tags.TARGET):
            continue
        if col.is_list:
            values = cols[col.name + "__values"].astype(np.float32)
            offsets = cols[col.name + "__offsets"]
            lengths = np.maximum(np.diff(offsets), 1)
            sums = np.add.reduceat(values, offsets[:-1])
            features.append(sums / lengths)
        else:
            features.append(cols[col.name].astype(np.float32))
        feature_names.append(col.name)
    X = np.stack(features, axis=1)
    y = cols[target_column].astype(np.float32)
    qid = None
    if qid_column is None:
        sel = schema.select_by_tag(Tags.USER_ID)
        qid_column = sel.first.name if len(sel) else None
    if qid_column is not None and qid_column in cols:
        qid = cols[qid_column]
    return X, y, qid, feature_names


class XGBoost:
    """Train XGBoost on a schema'd Dataset (objectives incl. ``rank:*`` which sort
    by qid as xgboost requires, mirroring the reference's qid handling)."""

    def __init__(self, schema: Schema, objective: str = "binary:logistic",
                 target_column: Optional[str] = None, **params):
        try:
            import xgboost  # noqa
        except ImportError as e:
            raise ImportError(
                "xgboost is not installed in this environment; the adapter is "
                "available when it is"
            ) from e
        self.schema = schema
        self.objective = objective
        self.target_column = target_column
        self.params = {"objective": objective, **params}
        self.booster = None

    def _dmatrix(self, dataset: Dataset):
        import xgboost as xgb

        X, y, qid, names = dataset_to_xy(dataset, self.schema, self.target_column)
        if self.objective.startswith("rank"):
            order = np.argsort(qid, kind="stable")
            X, y, qid = X[order], y[order], qid[order]
            return xgb.DMatrix(X, label=y, qid=qid, feature_names=names)
        return xgb.DMatrix(X, label=y, feature_names=names)

    def fit(self, dataset: Dataset, num_boost_round: int = 50, evals=None, **kwargs):
        import xgboost as xgb

        dtrain = self._dmatrix(dataset)
        evals = [(self._dmatrix(d), name) for d, name in (evals or [])]
        self.booster = xgb.train(
            self.params, dtrain, num_boost_round=num_boost_round, evals=evals, **kwargs
        )
        return self

    def evaluate(self, dataset: Dataset) -> Dict[str, float]:
        dmat = self._dmatrix(dataset)
        raw = self.booster.eval(dmat)
        out = {}
        for part in raw.split("\t")[1:]:
            name, value = part.split(":")
            out[name] = float(value)
        return out

    def predict(self, dataset: Dataset) -> np.ndarray:
        return self.booster.predict(self._dmatrix(dataset))

    def save(self, path: str):
        import os

        os.makedirs(path, exist_ok=True)
        self.booster.save_model(os.path.join(path, "model.json"))
        self.schema.save(os.path.join(path, "schema.json"))
