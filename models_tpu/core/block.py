"""Block: the composable unit of the DSL.

Equivalent role to the reference's ``Block`` (``merlin/models/tf/core/base.py:160``),
rebuilt on flax NNX instead of Keras:

- a Block is an ``nnx.Module``; parameters are NNX state, composition is plain Python
  object graphs, and the training engine splits the graph once and runs jitted pure
  functions over the state (no per-step Python in the hot loop);
- schema-driven construction: blocks carry an optional ``schema`` used by combinators
  to auto-filter dict inputs per branch;
- fluent graph building: ``>>`` / ``connect`` / ``connect_branch`` /
  ``connect_with_residual`` / ``repeat`` mirror the reference's API;
- dims are resolved by a single eager "build" forward (Keras-style ``build()``
  without shape threading: the first call materializes lazy params, after which
  every shape is static for XLA).
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional, Sequence, Union

import jax.numpy as jnp
from flax import nnx

from ..registry import block_registry
from ..schema import Schema
from .types import ModelContext, SequenceFeature, TensorDict

_CALL_KWARGS_CACHE: Dict[type, Any] = {}


def call_block(block, inputs, **kwargs):
    """Call a block/callable, passing only the kwargs its signature accepts.

    Mirrors the reference's ``call_layer`` (``tf/utils/tf_utils.py:433``): blocks
    opt into ``training``/``context``/``targets`` by declaring them.
    """
    fn = block.__call__ if not inspect.isfunction(block) else block
    key = type(block) if not inspect.isfunction(block) else block
    accepted = _CALL_KWARGS_CACHE.get(key)
    if accepted is None:
        try:
            sig = inspect.signature(fn)
            params = sig.parameters.values()
            if any(p.kind == inspect.Parameter.VAR_KEYWORD for p in params):
                accepted = True  # accepts **kwargs
            else:
                accepted = frozenset(
                    p.name for p in params if p.kind in (p.KEYWORD_ONLY, p.POSITIONAL_OR_KEYWORD)
                )
        except (TypeError, ValueError):
            accepted = frozenset()
        _CALL_KWARGS_CACHE[key] = accepted
    if accepted is True:
        return fn(inputs, **kwargs)
    return fn(inputs, **{k: v for k, v in kwargs.items() if k in accepted})


class Block(nnx.Module):
    """Base class for all blocks.

    Subclasses implement ``__call__(self, inputs, *, training=False, context=None)``
    (only the kwargs they need). ``inputs`` is either a tensor or a
    ``Dict[str, tensor | SequenceFeature]``.

    Constructor calls are captured (see ``core/config.py``) so any composed
    model serializes to a declarative config tree — the reference's
    ``get_config/from_config`` contract without per-class boilerplate.
    """

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        if "__init__" in cls.__dict__:
            orig = cls.__dict__["__init__"]
            if not getattr(orig, "_captures_config", False):
                import functools

                from .config import record_init

                @functools.wraps(orig)
                def wrapped(self, *args, __orig=orig, **kwargs):
                    record_init(self, args, kwargs)
                    __orig(self, *args, **kwargs)

                wrapped._captures_config = True
                cls.__init__ = wrapped

    def __init__(self, schema: Optional[Schema] = None, block_name: Optional[str] = None):
        from .config import record_init

        record_init(self, (), {"schema": schema, "block_name": block_name})
        self.schema = schema
        self.block_name = block_name or type(self).__name__

    # ---- schema ------------------------------------------------------------
    def set_schema(self, schema: Optional[Schema]):
        if schema is not None and getattr(self, "schema", None) is None:
            self.schema = schema
        return self

    # ---- fluent composition (reference tf/core/base.py:268-470) ------------
    def __rshift__(self, other) -> "Block":
        from .combinators import SequentialBlock

        return SequentialBlock([self, other])

    def __rrshift__(self, other) -> "Block":
        from .combinators import SequentialBlock

        return SequentialBlock([other, self])

    def connect(self, *blocks) -> "Block":
        from .combinators import SequentialBlock

        return SequentialBlock([self, *blocks])

    def connect_branch(self, *branches, add_rest: bool = False, aggregation=None) -> "Block":
        from .combinators import ParallelBlock, SequentialBlock

        return SequentialBlock([self, ParallelBlock(list(branches), aggregation=aggregation)])

    def connect_with_residual(self, block, activation=None) -> "Block":
        from .combinators import ResidualBlock, SequentialBlock

        return SequentialBlock([self, ResidualBlock(block, activation=activation)])

    def connect_with_shortcut(self, block, shortcut_filter=None, aggregation="concat") -> "Block":
        from .combinators import SequentialBlock, WithShortcut

        return SequentialBlock([self, WithShortcut(block, aggregation=aggregation)])

    def _fresh_copy(self, i: int) -> "Block":
        """Deepcopy with re-seeded initializers: a plain deepcopy of an unbuilt
        block duplicates its seeds and every copy would initialize identically
        (the reference's Keras clone re-initializes instead)."""
        return fresh_copy(self, i)

    def repeat(self, num: int) -> "Block":
        """Stack ``num`` fresh copies of this block sequentially (reference
        ``Block.repeat``). Copies share the class+config, not the parameters."""
        from .combinators import SequentialBlock

        return SequentialBlock([self] + [self._fresh_copy(i) for i in range(1, num)])

    def repeat_in_parallel(self, num: int, prefix: str = "branch", aggregation=None) -> "Block":
        from .combinators import ParallelBlock

        branches = {
            f"{prefix}_{i}": (self if i == 0 else self._fresh_copy(i)) for i in range(num)
        }
        return ParallelBlock(branches, aggregation=aggregation)

    def as_model(self):
        from ..models.base import Model

        return Model(self)

    # ---- introspection -----------------------------------------------------
    def select_by_name(self, name: str) -> Optional["Block"]:
        return self if self.block_name == name else None

    def __repr__(self):
        return f"{type(self).__name__}()"


@block_registry.register("no-op")
class NoOp(Block):
    """Identity (reference ``tf/core/base.py``)."""

    def __call__(self, inputs, **kwargs):
        return inputs


class Lambda(Block):
    """Wrap a plain function as a Block. The function must be jit-traceable.

    Note: models containing ``Lambda`` blocks serialize only if the function is a
    module-level def (pickle rule) — mirror of Keras Lambda-layer caveats.
    """

    def __init__(self, fn: Callable, block_name: Optional[str] = None):
        super().__init__(block_name=block_name or getattr(fn, "__name__", "lambda"))
        self.fn = fn

    def __call__(self, inputs, **kwargs):
        return call_block(self.fn, inputs, **kwargs)


class Debug(Block):
    """Pass-through that records the last value seen (eager builds only)."""

    def __call__(self, inputs, **kwargs):
        return inputs


def iter_blocks(root, _seen=None):
    """Depth-first traversal of the block graph (root first).

    Used by the engine to find output heads, collect regularization losses, and
    implement freeze/unfreeze — the role of Keras' ``.submodules`` walk in the
    reference (``tf/models/base.py:2101``)."""
    from flax import nnx

    if _seen is None:
        _seen = set()
    if id(root) in _seen:
        return
    _seen.add(id(root))
    yield root
    children = []
    if isinstance(root, (nnx.List, list, tuple)):
        children = list(root)
    elif isinstance(root, (nnx.Dict,)):
        children = list(root.values())
    elif isinstance(root, nnx.Module):
        children = list(vars(root).values())
    for child in children:
        if isinstance(child, (nnx.Module, nnx.List, nnx.Dict, list, tuple)):
            yield from iter_blocks(child, _seen)


def fresh_copy(obj, salt: int):
    """Deepcopy ANY block-like object (Block, raw nnx module, string spec via
    as_block) with re-seeded lazy initializers. ``salt`` spaces the seed offsets;
    call sites at different nesting levels must use disjoint salt ranges."""
    import copy

    obj = as_block(obj)
    cp = copy.deepcopy(obj)
    for b in iter_blocks(cp):
        if isinstance(getattr(b, "seed", None), int):
            b.seed = b.seed + 7919 * salt
    return cp


def as_block(obj) -> Block:
    """Coerce callables / strings into Blocks."""
    if isinstance(obj, Block):
        return obj
    if isinstance(obj, str):
        return block_registry.parse(obj)
    if isinstance(obj, nnx.Module):
        return obj  # raw nnx layers (Linear, BatchNorm, ...) are callable blocks
    if callable(obj):
        return Lambda(obj)
    raise TypeError(f"Cannot convert {obj!r} to a Block")
