"""Mesh distribution: the TPU-native replacement for Horovod (DP) + SOK (MP tables).

Reference parallelism (SURVEY.md §2.9): Horovod allreduce data-parallelism
(``tf/distributed/backend.py``) and SOK row-sharded embedding tables with fused
all2all lookup (``tf/distributed/embedding.py``). Here both collapse into one
``jax.sharding.Mesh`` with two logical axes:

- ``data``: batches are sharded across it; XLA turns the gradient sum into a
  psum over ICI — no DistributedOptimizer wrapper, no LR×world-size bookkeeping
  (the loss mean over the global batch already matches single-chip semantics);
- ``model``: embedding-table rows are sharded across it; XLA inserts the gather/
  all-to-all for lookups automatically from the sharding annotations (the Pallas
  fused path in ``ops/embedding_lookup.py`` is a drop-in for the hot case).

Sharding rules are path-regex → PartitionSpec over the nnx param state, so user
models need zero code changes to distribute.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.types import SequenceFeature

DATA_AXIS = "data"
MODEL_AXIS = "model"

# default placement: embedding table rows (and their sparse-optimizer slots) →
# model axis; everything else replicated
DEFAULT_RULES: List[Tuple[str, P]] = [
    (r"\btable\b", P(MODEL_AXIS, None)),
    (r"\bsparse_slots\b", P(MODEL_AXIS, None)),
]


def make_mesh(
    shape: Union[Dict[str, int], Sequence[int], None] = None,
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
    devices=None,
) -> Mesh:
    """Build a mesh. ``shape`` e.g. ``{"data": 4, "model": 2}``; default puts all
    devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = {DATA_AXIS: n, MODEL_AXIS: 1}
    if isinstance(shape, dict):
        axis_names = tuple(shape.keys())
        dims = tuple(shape.values())
    else:
        dims = tuple(shape)
    if int(np.prod(dims)) != n:
        raise ValueError(f"Mesh shape {dims} does not match {n} devices")
    dev_array = np.asarray(devices).reshape(dims)
    return Mesh(dev_array, axis_names)


def _path_to_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return "/".join(parts)


def sharding_for_tree(
    tree,
    mesh: Mesh,
    rules: Optional[List[Tuple[str, P]]] = None,
) -> Dict:
    """A pytree of NamedShardings matching ``tree``, from path-regex rules.

    A rule only applies if the spec's sharded axes divide the leaf's dims;
    otherwise the leaf stays replicated (small tables don't benefit from
    sharding and padding them would waste HBM).
    """
    rules = DEFAULT_RULES if rules is None else rules
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def assign(path, leaf):
        pstr = _path_to_str(path)
        arr = leaf
        if hasattr(arr, "shape"):
            for pat, spec in compiled:
                if pat.search(pstr):
                    if _spec_fits(spec, arr.shape, mesh):
                        return NamedSharding(mesh, spec)
                    break
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, tree)


def _spec_fits(spec: P, shape, mesh: Mesh) -> bool:
    if len(spec) > len(shape):
        return False
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        axes = axis if isinstance(axis, (tuple, list)) else (axis,)
        size = int(np.prod([mesh.shape[a] for a in axes]))
        if dim % size != 0:
            return False
    return True


def shard_state(state, mesh: Mesh, rules=None):
    """Place an nnx State (or any pytree of arrays) onto the mesh."""
    shardings = sharding_for_tree(state, mesh, rules)
    return jax.device_put(state, shardings)


def batch_sharding(mesh: Mesh):
    """NamedSharding for input batches: leading (batch) axis over data."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch, mesh: Mesh):
    """Place a feature/target batch with batch-axis sharding over ``data``."""
    sh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            if x.shape[0] % mesh.shape[DATA_AXIS] == 0:
                return jax.device_put(x, sh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


# ---------------------------------------------------------------------------
# host / chief utilities (reference: hvd rank-0 guards, tf/models/base.py:1614)
# ---------------------------------------------------------------------------

def process_index() -> int:
    return jax.process_index()


def is_chief() -> bool:
    return jax.process_index() == 0


def chief_only(fn):
    """Decorator: run only on the chief host (multi-host save/log guards)."""

    def wrapper(*args, **kwargs):
        if is_chief():
            return fn(*args, **kwargs)
        return None

    return wrapper


def shared_seed(base_seed: int = 0) -> int:
    """Deterministic seed agreed by all hosts (replaces the reference's
    hvd.allreduce seed agreement, ``tf/loader.py:451``): with a single-controller
    JAX program all hosts already share Python state, so the base seed IS the
    agreement."""
    return int(base_seed)
