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
import jax.numpy as jnp
import numpy as np

SIDECAR_DIR = ".merlin"
MODEL_FILE = "model.pkl"
CONFIG_FILE = "config.json"
STATE_FILE = "state.npz"

# engine attributes that hold closures / compiled functions — rebuilt by compile()
_ENGINE_ATTRS = ("_tx", "_base_tx", "_step_cache", "_graphdef", "_pre_transform", "_loss_spec", "_metrics_spec", "_mesh")


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
        arr = np.asarray(leaf)
        if arr.dtype.name == "bfloat16":
            # np.savez stores ml_dtypes arrays as raw void bytes that won't
            # round-trip; float32 is exact for every bf16 value and the load
            # path casts back to the template leaf's dtype
            arr = arr.astype(np.float32)
        out[_path_str(path)] = arr
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
            out = jnp.asarray(arrays[key])
            tgt = getattr(leaf, "dtype", None)
            if tgt is not None and out.dtype != tgt:
                out = out.astype(tgt)  # e.g. bf16 tables stored as exact f32
            return out

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


# ---------------------------------------------------------------------------
# serving export: code-free StableHLO artifact (the reference's
# SavedModel-for-Triton analog, tf/models/base.py:1687-1717 + merlin/models/io.py)
# ---------------------------------------------------------------------------

SERVING_FILE = "serving.stablehlo"
SERVING_WEIGHTS = "weights.npz"
SERVING_SPEC = "serving_spec.json"


def _flatten_features(x: Dict[str, Any]):
    """SequenceFeatures → name__values/name__mask arrays (plain dict pytree)."""
    from ..core.types import SequenceFeature

    flat = {}
    for name, v in x.items():
        if isinstance(v, SequenceFeature):
            flat[name + "__values"] = v.values
            flat[name + "__mask"] = v.mask
        else:
            flat[name] = v
    return flat


def _unflatten_features(flat: Dict[str, Any]):
    from ..core.types import SequenceFeature

    out = {}
    for name, v in flat.items():
        if name.endswith("__values"):
            base = name[: -len("__values")]
            out[base] = SequenceFeature(v, flat[base + "__mask"])
        elif name.endswith("__mask"):
            continue
        else:
            out[name] = v
    return out


def export_serving(model, path: str, data=None, batch_size: int = 1024,
                   platforms=None) -> str:
    """Export the inference step as a self-contained serving artifact:

    - ``serving.stablehlo`` — the jitted predict function serialized with
      ``jax.export`` (StableHLO): code-free, loadable in any process with jax
      installed (no models_tpu import needed), runnable on the platforms it
      was lowered for (default: the current backend + cpu);
    - ``weights.npz`` — every parameter/state array, passed as inputs (not
      baked into the program);
    - ``serving_spec.json`` — feature names/shapes/dtypes + weight order;
    - ``.merlin/`` input/output schema sidecars (Merlin Systems contract).

    The batch size is static (XLA serving convention) — pad smaller batches.
    """
    import jax.export as jex
    from flax import nnx

    from ..core.block import call_block
    from ..core.types import ModelContext, to_device_batch

    os.makedirs(path, exist_ok=True)
    if data is not None:
        from ..data.dataset import Dataset as _DS
        from ..data.loader import Loader as _Loader

        if isinstance(data, dict):
            x = data
            model.build((x, None))  # lazy blocks must materialize params eagerly
        else:
            loader = data if isinstance(data, _Loader) else _Loader(
                _DS(data), batch_size=batch_size, shuffle=False, drop_last=True
            )
            x, _ = loader.peek()
            model.build(loader)
    else:
        raise ValueError("export_serving needs sample data (Dataset/Loader/dict)")
    if not model._compiled:
        model.compile()
    x = to_device_batch(x)
    # drop loader bookkeeping; serving batches are always full
    x = {k: v for k, v in x.items() if k != "__row_valid__"}
    flat_x = _flatten_features(x)

    graphdef, state = nnx.split(model)
    flat_state = {}
    for p, leaf in jax.tree_util.tree_flatten_with_path(state)[0]:
        if leaf is not None:
            # de-shard through the host: mesh-trained params carry
            # NamedShardings and jax.export would bake the training mesh's
            # device count into the program, making the artifact unloadable
            # on a serving host with a different topology (dryrun config 8)
            flat_state[_path_str(p)] = jnp.asarray(np.asarray(jax.device_get(leaf)))

    state_template = state

    def serve(weights: Dict[str, Any], feats: Dict[str, Any]):
        def restore(pth, leaf):
            return None if leaf is None else weights[_path_str(pth)]

        st = jax.tree_util.tree_map_with_path(restore, state_template)
        mod = nnx.merge(graphdef, st)
        xx = _unflatten_features(feats)
        context = ModelContext(features=xx)
        preds = call_block(mod, xx, targets=None, training=False, context=context)
        from ..core.types import Prediction, TopKPrediction

        if isinstance(preds, Prediction):
            heads = mod.heads()
            act = heads[0].activation if heads else (lambda v: v)
            return act(preds.outputs)
        if isinstance(preds, TopKPrediction):
            return {"scores": preds.scores, "ids": preds.identifiers}
        if isinstance(preds, dict):
            out = {}
            head_by_name = {h.block_name: h for h in mod.heads()}
            for k, v in preds.items():
                if isinstance(v, Prediction):
                    head = head_by_name.get(k)
                    out[k] = head.activation(v.outputs) if head else v.outputs
                else:
                    out[k] = v
            return out
        return preds

    if platforms is None:
        backend = jax.default_backend()
        platforms = (backend, "cpu") if backend != "cpu" else ("cpu",)
    exported = jex.export(jax.jit(serve), platforms=tuple(platforms))(flat_state, flat_x)
    with open(os.path.join(path, SERVING_FILE), "wb") as f:
        f.write(exported.serialize())
    # np.savez writes ml_dtypes arrays (bf16 tables/slots) as raw void bytes
    # that won't round-trip: store them as uint16 bit patterns and record the
    # true dtype so the loader can view them back — the exported program's
    # input avals REQUIRE the exact dtype
    weight_arrays = {}
    weight_dtypes = {}
    for k, v in flat_state.items():
        a = np.asarray(v)
        if a.dtype.name == "bfloat16":
            weight_dtypes[k] = "bfloat16"
            a = a.view(np.uint16)
        weight_arrays[k] = a
    np.savez(os.path.join(path, SERVING_WEIGHTS), **weight_arrays)
    spec = {
        "features": {
            k: {"shape": list(np.shape(v)), "dtype": str(np.asarray(v).dtype)}
            for k, v in flat_x.items()
        },
        "batch_size": int(next(iter(flat_x.values())).shape[0]),
        "platforms": list(platforms),
        "weight_dtypes": weight_dtypes,
    }
    with open(os.path.join(path, SERVING_SPEC), "w") as f:
        json.dump(spec, f, indent=1)
    _write_sidecar(model, path)
    return path


class ServingModel:
    """A loaded serving artifact: ``ServingModel(path)(features) -> outputs``.
    Pure jax — no model code required."""

    def __init__(self, path: str):
        import jax.export as jex

        with open(os.path.join(path, SERVING_FILE), "rb") as f:
            self.exported = jex.deserialize(f.read())
        with open(os.path.join(path, SERVING_SPEC)) as f:
            self.spec = json.load(f)
        wdt = self.spec.get("weight_dtypes", {})
        with np.load(os.path.join(path, SERVING_WEIGHTS)) as z:
            self.weights = {
                k: jnp.asarray(
                    z[k].view(wdt[k]) if k in wdt else z[k]
                )
                for k in z.files
            }

    def __call__(self, features: Dict[str, Any]):
        flat = _flatten_features(features)
        return self.exported.call(self.weights, flat)


def load_serving(path: str) -> ServingModel:
    return ServingModel(path)
