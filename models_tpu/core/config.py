"""Declarative model-config serialization (the reference's pervasive
``get_config/from_config`` contract, ``tf/models/base.py:1719-1728`` +
``models/utils/schema_utils.py:37-49``, without per-class boilerplate).

Every :class:`Block` subclass's ``__init__`` call is captured (outermost ctor
wins), so any composed model reduces to a JSON tree of
``{"__block__": "module:QualName", "args": [...], "kwargs": {...}}`` nodes.
Shared submodules (e.g. a weight-tied EmbeddingTable appearing in both the
input block and the ContrastiveOutput) are serialized once and referenced by
id, preserving identity on load. Arrays inside configs are stored in the
side-car ``.npz``; values with no declarative encoding (lambdas, raw optax
objects) fall back to a pickled leaf — plain zoo models produce pure JSON.

Loading imports classes by path, replays constructors, rebuilds lazy params by
running the saved build-spec batch, then restores state arrays by path.
"""

from __future__ import annotations

import base64
import enum
import importlib
import pickle
import weakref
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

# module-id → (args, kwargs) as passed to the outermost constructor.
# Kept OUTSIDE the modules so nnx graph machinery never sees child-module refs
# as static attribute data.
_INIT_CAPTURE: "weakref.WeakValueDictionary[int, Any]" = weakref.WeakValueDictionary()
_INIT_ARGS: Dict[int, Tuple[tuple, dict]] = {}


def record_init(obj, args, kwargs) -> None:
    key = id(obj)
    if key in _INIT_ARGS and _INIT_CAPTURE.get(key) is obj:
        return  # outermost constructor already recorded
    _INIT_ARGS[key] = (args, kwargs)
    _INIT_CAPTURE[key] = obj
    # prune entries whose object died (id reuse safety + unbounded growth)
    if len(_INIT_ARGS) > 4096:
        dead = [k for k in _INIT_ARGS if k not in _INIT_CAPTURE]
        for k in dead:
            del _INIT_ARGS[k]


def init_args_of(obj):
    key = id(obj)
    if _INIT_CAPTURE.get(key) is obj:
        return _INIT_ARGS.get(key)
    return None


class ConfigError(ValueError):
    pass


def _class_path(cls) -> str:
    if "<locals>" in cls.__qualname__:
        raise ConfigError(
            f"{cls.__qualname__} is defined inside a function and cannot be "
            "imported by path; move it to module level to make it serializable"
        )
    return f"{cls.__module__}:{cls.__qualname__}"


def _import_class(path: str):
    mod, qual = path.split(":")
    obj = importlib.import_module(mod)
    for part in qual.split("."):
        obj = getattr(obj, part)
    return obj


class _Encoder:
    def __init__(self):
        self.memo: Dict[int, int] = {}
        self.arrays: Dict[str, np.ndarray] = {}
        self._n = 0

    def encode(self, v) -> Any:
        import jax
        import jax.numpy as jnp
        from flax import nnx

        from ..schema import ColumnSchema, Schema, Tags
        from .block import Block

        if v is None or isinstance(v, (bool, int, float, str)):
            return v
        if isinstance(v, enum.Enum):  # Tags etc.
            return {"__enum__": _class_path(type(v)), "value": v.value}
        if isinstance(v, np.dtype):
            return {"__dtype__": v.name}
        if isinstance(v, type):
            # dtype-like classes (jnp.bfloat16, np.float32, ...) passed as
            # constructor args (e.g. EmbeddingTable(dtype=...))
            try:
                return {"__dtype__": np.dtype(v).name}
            except TypeError:
                pass
        if isinstance(v, (np.ndarray, jax.Array)) or isinstance(v, (np.generic,)):
            arr = np.asarray(v)
            if arr.size <= 16 and arr.dtype.kind in "ifb":
                return {"__array__": arr.tolist(), "dtype": str(arr.dtype), "shape": list(arr.shape)}
            key = f"cfg_arr_{len(self.arrays)}"
            self.arrays[key] = arr
            return {"__array_ref__": key}
        if isinstance(v, Schema):
            return {"__schema__": v.to_dict()}
        if isinstance(v, ColumnSchema):
            return {"__column__": Schema([v]).to_dict()}
        if isinstance(v, tuple):
            return {"__tuple__": [self.encode(x) for x in v]}
        if isinstance(v, list):
            return [self.encode(x) for x in v]
        if isinstance(v, dict):
            if all(isinstance(k, str) for k in v):
                return {"__dict__": {k: self.encode(x) for k, x in v.items()}}
            raise ConfigError("non-string dict keys")
        if isinstance(v, Block):
            if id(v) in self.memo:
                return {"__ref__": self.memo[id(v)]}
            captured = init_args_of(v)
            if captured is None:
                raise ConfigError(
                    f"{type(v).__name__} has no captured constructor args "
                    "(deep-copied or hand-built block)"
                )
            idx = self._n
            self._n += 1
            self.memo[id(v)] = idx
            args, kwargs = captured
            node = {
                "__block__": _class_path(type(v)),
                "id": idx,
                "args": [self.encode(a) for a in args],
                "kwargs": {k: self.encode(a) for k, a in kwargs.items()},
            }
            name = getattr(v, "block_name", None)
            if name is not None:
                node["block_name"] = name
            if getattr(v, "_frozen", False):
                node["frozen"] = True
            return node
        # last resort: pickled leaf (lambdas, optax objects, raw nnx modules)
        try:
            payload = base64.b64encode(pickle.dumps(v)).decode("ascii")
        except Exception as e:  # pragma: no cover
            raise ConfigError(f"cannot serialize {type(v).__name__}: {e}") from e
        return {"__pickle__": payload, "type": type(v).__name__}


class _Decoder:
    def __init__(self, arrays: Dict[str, np.ndarray]):
        self.memo: Dict[int, Any] = {}
        self.arrays = arrays

    def decode(self, v) -> Any:
        from ..schema import Schema

        if v is None or isinstance(v, (bool, int, float, str)):
            return v
        if isinstance(v, list):
            return [self.decode(x) for x in v]
        assert isinstance(v, dict)
        if "__enum__" in v:
            return _import_class(v["__enum__"])(v["value"])
        if "__dtype__" in v:
            return np.dtype(v["__dtype__"])  # ml_dtypes names resolve once jax is imported
        if "__array__" in v:
            return np.asarray(v["__array__"], dtype=v["dtype"]).reshape(v["shape"])
        if "__array_ref__" in v:
            return self.arrays[v["__array_ref__"]]
        if "__schema__" in v:
            return Schema.from_dict(v["__schema__"])
        if "__column__" in v:
            return Schema.from_dict(v["__column__"]).first
        if "__tuple__" in v:
            return tuple(self.decode(x) for x in v["__tuple__"])
        if "__dict__" in v:
            return {k: self.decode(x) for k, x in v["__dict__"].items()}
        if "__ref__" in v:
            return self.memo[v["__ref__"]]
        if "__block__" in v:
            cls = _import_class(v["__block__"])
            args = [self.decode(a) for a in v["args"]]
            kwargs = {k: self.decode(a) for k, a in v["kwargs"].items()}
            obj = cls(*args, **kwargs)
            if "block_name" in v:
                obj.block_name = v["block_name"]
            if v.get("frozen"):
                obj._frozen = True
            self.memo[v["id"]] = obj
            return obj
        if "__pickle__" in v:
            return pickle.loads(base64.b64decode(v["__pickle__"]))
        raise ConfigError(f"unknown config node: {list(v)}")


def to_config(block) -> Tuple[dict, Dict[str, np.ndarray]]:
    """(config tree, side arrays) for a Block built from captured ctor args."""
    enc = _Encoder()
    tree = enc.encode(block)
    if not isinstance(tree, dict) or "__block__" not in tree:
        raise ConfigError(f"not a config-serializable block: {type(block).__name__}")
    return tree, enc.arrays


def from_config(tree: dict, arrays: Optional[Dict[str, np.ndarray]] = None):
    return _Decoder(arrays or {}).decode(tree)
