"""Cross-backend model protocol (reference ``merlin/models/api.py:21-77``):
every backend — the JAX/TPU engine, the torch side-stack, XGBoost, implicit,
LightFM — satisfies ``fit / evaluate / predict / save``."""

from __future__ import annotations

from typing import Any, Dict, Protocol, runtime_checkable


@runtime_checkable
class MerlinModel(Protocol):
    def fit(self, dataset, **kwargs) -> Any: ...

    def evaluate(self, dataset, **kwargs) -> Dict[str, float]: ...

    def predict(self, dataset, **kwargs) -> Any: ...

    def save(self, path: str) -> Any: ...
