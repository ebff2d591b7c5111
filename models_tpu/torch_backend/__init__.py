"""PyTorch side-backend (reference ``merlin/models/torch/`` — Lightning there).

A compact CPU/GPU torch stack behind the same ``fit/evaluate/predict/save/load``
protocol (``models_tpu/api.py``), consuming the same schema-driven Datasets and
Loader. Use it for parity checks against the JAX/TPU stack or for environments
without TPUs; the TPU stack is the primary engine.
"""

from .models import TorchDCNModel, TorchDLRMModel, TorchMLPModel, TorchModel

__all__ = ["TorchModel", "TorchDLRMModel", "TorchDCNModel", "TorchMLPModel"]
