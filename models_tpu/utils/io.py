"""Model persistence.

Reference behavior (``tf/models/base.py:1687-1728`` + ``merlin/models/io.py:26``):
save = serialized model + a ``.merlin/`` sidecar with input/output schema JSON so
downstream serving systems can introspect the contract. Here:

- **declarative format (default)**: ``config.json`` holds the architecture as a
  constructor-replay tree (``core/config.py`` — the reference's
  ``get_config/from_config`` contract), ``state.npz`` holds every parameter
  array keyed by state path, ``build_spec`` records the shapes of the build
  batch so lazy params re-materialize in a fresh process. Loading never
  unpickles the module graph.
- a legacy whole-graph pickle fallback covers blocks the config system cannot
  express (deep-copied blocks, hand-mutated graphs);
- ``.merlin/input_schema.json`` is written in the TF-metadata JSON layout,
  byte-compatible with NVTabular consumers;
- step checkpoints during training use orbax (see ``utils/checkpoint.py``).
"""

from __future__ import annotations

import json
import os
import pickle
import warnings
from typing import Any, Dict, Optional

import jax
import numpy as np

SIDECAR_DIR = ".merlin"
MODEL_FILE = "model.pkl"
CONFIG_FILE = "config.json"
STATE_FILE = "state.npz"

# engine attributes that hold closures / compiled functions — rebuilt by compile()
_ENGINE_ATTRS = ("_tx", "_step_cache", "_graphdef", "_pre_transform", "_loss_spec", "_metrics_spec", "_mesh")


# ---------------------------------------------------------------------------
# build-spec: shapes/dtypes of the build batch, replayed at load
# ---------------------------------------------------------------------------

def spec_of(v) -> Any:
    from ..core.types import SequenceFeature

    if v is None:
        return None
    if isinstance(v, SequenceFeature):
        return {"__seq__": [spec_of(v.values), spec_of(v.mask)]}
    if isinstance(v, dict):
        return {"__dict__": {k: spec_of(x) for k, x in v.items()}}
    if isinstance(v, tuple):
        return {"__tuple__": [spec_of(x) for x in v]}
    arr = np.asarray(v)
    return {"shape": list(arr.shape), "dtype": str(arr.dtype)}


def zeros_from_spec(spec) -> Any:
    from ..core.types import SequenceFeature

    if spec is None:
        return None
    if "__seq__" in spec:
        vals, mask = spec["__seq__"]
        return SequenceFeature(zeros_from_spec(vals), zeros_from_spec(mask))
    if "__dict__" in spec:
        return {k: zeros_from_spec(x) for k, x in spec["__dict__"].items()}
    if "__tuple__" in spec:
        return tuple(zeros_from_spec(x) for x in spec["__tuple__"])
    dtype = np.dtype(spec["dtype"])
    if dtype.kind == "b":
        return np.ones(spec["shape"], dtype=dtype)  # masks/validity: all True
    return np.zeros(spec["shape"], dtype=dtype)


# ---------------------------------------------------------------------------
# state flattening
# ---------------------------------------------------------------------------

def _path_str(path) -> str:
    parts = []
    for k in path:
        for attr in ("key", "idx", "name"):
            if hasattr(k, attr):
                parts.append(str(getattr(k, attr)))
                break
        else:
            parts.append(str(k))
    return "/".join(parts)


def _flatten_state(state) -> Dict[str, np.ndarray]:
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    out: Dict[str, np.ndarray] = {}
    for path, leaf in leaves:
        if leaf is None:
            continue
        out[_path_str(path)] = np.asarray(leaf)
    return out


# ---------------------------------------------------------------------------
# save / load
# ---------------------------------------------------------------------------

def _write_sidecar(model, path: str) -> None:
    schema = getattr(model, "schema", None)
    if schema is not None:
        sidecar = os.path.join(path, SIDECAR_DIR)
        os.makedirs(sidecar, exist_ok=True)
        schema.save(os.path.join(sidecar, "input_schema.json"))
        targets = schema.targets
        if len(targets):
            targets.save(os.path.join(sidecar, "output_schema.json"))


def save_model(model, path: str, format: str = "auto") -> str:
    """``format``: "config" (declarative, no graph pickling), "pickle"
    (legacy whole-graph), or "auto" (config with pickle fallback)."""
    os.makedirs(path, exist_ok=True)
    if format in ("auto", "config"):
        try:
            _save_config(model, path)
            _write_sidecar(model, path)
            # remove a stale legacy pickle so load() picks the config format
            legacy = os.path.join(path, MODEL_FILE)
            if os.path.exists(legacy):
                os.remove(legacy)
            return path
        except Exception as e:
            if format == "config":
                raise
            warnings.warn(
                f"declarative save failed ({type(e).__name__}: {e}); "
                "falling back to whole-graph pickle"
            )
    _save_pickle(model, path)
    _write_sidecar(model, path)
    return path


def _save_config(model, path: str) -> None:
    from flax import nnx

    from ..core.config import to_config

    tree, cfg_arrays = to_config(model)
    _, state = nnx.split(model)
    arrays = _flatten_state(state)
    overlap = set(arrays) & set(cfg_arrays)
    assert not overlap, f"state/config array key clash: {overlap}"
    arrays.update(cfg_arrays)
    doc = {
        "format": "config",
        "config": tree,
        "build_spec": getattr(model, "_build_spec", None),
        "compiled": False,
    }
    # json round-trip check up-front so failures fall back cleanly
    text = json.dumps(doc)
    with open(os.path.join(path, CONFIG_FILE), "w") as f:
        f.write(text)
    np.savez(os.path.join(path, STATE_FILE), **arrays)


def _save_pickle(model, path: str) -> None:
    from flax import nnx

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


def load_model(path: str):
    import jax.numpy as jnp
    from flax import nnx

    cfg_path = os.path.join(path, CONFIG_FILE)
    if os.path.exists(cfg_path):
        from ..core.config import from_config

        with open(cfg_path) as f:
            doc = json.load(f)
        with np.load(os.path.join(path, STATE_FILE)) as z:
            arrays = {k: z[k] for k in z.files}
        cfg_arrays = {k: v for k, v in arrays.items() if k.startswith("cfg_arr_")}
        model = from_config(doc["config"], cfg_arrays)
        spec = doc.get("build_spec")
        if spec is not None:
            x, y = zeros_from_spec(spec)
            model.build((x, y))
        _, state = nnx.split(model)

        def restore(pth, leaf):
            if leaf is None:
                return leaf
            key = _path_str(pth)
            if key not in arrays:
                raise KeyError(f"saved state missing {key!r}")
            return jnp.asarray(arrays[key])

        new_state = jax.tree_util.tree_map_with_path(restore, state)
        nnx.update(model, new_state)
        return model

    with open(os.path.join(path, MODEL_FILE), "rb") as f:
        model = pickle.load(f)
    graphdef, state = nnx.split(model)
    state = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a, state
    )
    nnx.update(model, state)
    return model
