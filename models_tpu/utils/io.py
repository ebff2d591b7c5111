"""Model persistence.

Reference behavior (``tf/models/base.py:1687-1728`` + ``merlin/models/io.py:26``):
save = serialized model + a ``.merlin/`` sidecar with input/output schema JSON so
downstream serving systems can introspect the contract. Here:

- the block graph (architecture + hyperparams) and all array state pickle cleanly
  (blocks avoid closures by design); arrays are converted to numpy for portability;
- ``.merlin/input_schema.json`` is written in the TF-metadata JSON layout, byte-
  compatible with NVTabular consumers;
- step checkpoints during training use orbax (see ``utils/checkpoint.py``).
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import jax
import numpy as np

SIDECAR_DIR = ".merlin"
MODEL_FILE = "model.pkl"


def _to_numpy_state(model):
    """Convert all jax arrays inside the model's nnx state to numpy in-place."""
    from flax import nnx
    import jax.numpy as jnp

    graphdef, state = nnx.split(model)
    state = jax.tree_util.tree_map(
        lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, state
    )
    return graphdef, state


# engine attributes that hold closures / compiled functions — rebuilt by compile()
_ENGINE_ATTRS = ("_tx", "_step_cache", "_graphdef", "_pre_transform", "_loss_spec", "_metrics_spec", "_mesh")


def save_model(model, path: str) -> str:
    os.makedirs(path, exist_ok=True)
    from flax import nnx

    # move arrays to host numpy for a portable pickle
    graphdef, state = nnx.split(model)
    np_state = jax.tree_util.tree_map(
        lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, state
    )
    nnx.update(model, np_state)
    saved_attrs = {}
    for attr in _ENGINE_ATTRS + ("_compiled",):
        if hasattr(model, attr):
            saved_attrs[attr] = getattr(model, attr)
            setattr(model, attr, False if attr == "_compiled" else None)
    try:
        with open(os.path.join(path, MODEL_FILE), "wb") as f:
            pickle.dump(model, f)
    finally:
        nnx.update(model, state)
        for attr, val in saved_attrs.items():
            setattr(model, attr, val)

    schema = getattr(model, "schema", None)
    if schema is not None:
        sidecar = os.path.join(path, SIDECAR_DIR)
        os.makedirs(sidecar, exist_ok=True)
        schema.save(os.path.join(sidecar, "input_schema.json"))
        targets = schema.targets
        if len(targets):
            targets.save(os.path.join(sidecar, "output_schema.json"))
    return path


def load_model(path: str):
    import jax.numpy as jnp
    from flax import nnx

    with open(os.path.join(path, MODEL_FILE), "rb") as f:
        model = pickle.load(f)
    graphdef, state = nnx.split(model)
    state = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a, state
    )
    nnx.update(model, state)
    return model
