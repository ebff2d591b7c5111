"""Combinators: Sequential / Parallel / Filter / Residual / Cond / MapValues.

Mirrors ``merlin/models/tf/core/combinators.py`` (SequentialBlock:32,
ParallelBlock:318, WithShortcut/ResidualBlock, Cond, MapValues) and
``tf/core/tabular.py`` (Filter:494, AsTabular:615) in one module.

ParallelBlock's schema-driven branch-input filtering (reference ``:615``) is the
mechanism that lets e.g. a two-tower model route USER-tagged columns to the query
tower and ITEM-tagged columns to the item tower automatically.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import jax.numpy as jnp
from flax import nnx

from ..schema import Schema, Tags
from .aggregation import TabularAggregation
from .block import Block, as_block, call_block
from .types import SequenceFeature, TensorDict


class SequentialBlock(Block):
    """Runs blocks in order, feeding each output to the next."""

    def __init__(self, blocks: Sequence, pre=None, post=None, block_name=None):
        super().__init__(block_name=block_name)
        flat: List = []
        for b in blocks:
            b = as_block(b)
            if isinstance(b, SequentialBlock) and type(b) is SequentialBlock:
                flat.extend(b.layers)
            else:
                flat.append(b)
        self.layers = nnx.List(flat)
        self.pre = as_block(pre) if pre is not None else None
        self.post = as_block(post) if post is not None else None
        # propagate schema from the first schema-carrying block
        for b in flat:
            s = getattr(b, "schema", None)
            if s is not None:
                self.schema = s
                break

    def __call__(self, inputs, **kwargs):
        out = inputs
        if self.pre is not None:
            out = call_block(self.pre, out, **kwargs)
        for layer in self.layers:
            out = call_block(layer, out, **kwargs)
        if self.post is not None:
            out = call_block(self.post, out, **kwargs)
        return out

    def __getitem__(self, idx):
        return self.layers[idx]

    def __len__(self):
        return len(self.layers)

    def __rshift__(self, other):
        return SequentialBlock([*self.layers, as_block(other)])

    def select_by_name(self, name: str) -> Optional[Block]:
        if self.block_name == name:
            return self
        for b in self.layers:
            found = getattr(b, "select_by_name", lambda n: None)(name)
            if found is not None:
                return found
        return None

    def __repr__(self):
        return f"SequentialBlock({list(self.layers)!r})"


class ParallelBlock(Block):
    """Named branches over the same (schema-filtered) input → dict outputs.

    - dict input + branch with a ``schema`` → branch sees only its schema's columns;
    - branch outputs that are dicts are flattened into the result (reference
      flattens nested ParallelBlocks the same way);
    - optional ``aggregation`` merges the dict to a single tensor.
    """

    def __init__(
        self,
        *branches,
        aggregation=None,
        pre=None,
        post=None,
        strict: bool = False,
        block_name=None,
        schema: Optional[Schema] = None,
    ):
        super().__init__(block_name=block_name, schema=schema)
        named: Dict[str, Block] = {}
        if len(branches) == 1 and isinstance(branches[0], dict):
            for name, b in branches[0].items():
                named[str(name)] = as_block(b)
        else:
            if len(branches) == 1 and isinstance(branches[0], (list, tuple)):
                branches = tuple(branches[0])
            for i, b in enumerate(branches):
                b = as_block(b)
                name = getattr(b, "block_name", None) or f"branch_{i}"
                if name in named or name == type(b).__name__:
                    name = f"{name.lower()}_{i}" if name in named else name
                named[name] = b
        self.branches = nnx.Dict(named)
        self.aggregation = TabularAggregation.parse(aggregation)
        self.pre = as_block(pre) if pre is not None else None
        self.post = as_block(post) if post is not None else None
        self.strict = strict
        if self.schema is None:
            schemas = [b.schema for b in named.values() if getattr(b, "schema", None) is not None]
            if schemas and len(schemas) == len(named):
                merged = schemas[0]
                for s in schemas[1:]:
                    merged = merged + s
                self.schema = merged

    # ------------------------------------------------------------------
    def _branch_inputs(self, name: str, branch, inputs):
        if isinstance(inputs, dict):
            bschema = getattr(branch, "schema", None)
            if bschema is not None and len(bschema):
                keep = {k: v for k, v in inputs.items() if k in bschema}
                if keep:
                    return keep
        return inputs

    def __call__(self, inputs, **kwargs):
        if self.pre is not None:
            inputs = call_block(self.pre, inputs, **kwargs)
        outputs: TensorDict = {}
        for name, branch in self.branches.items():
            out = call_block(branch, self._branch_inputs(name, branch, inputs), **kwargs)
            if isinstance(out, dict):
                for k, v in out.items():
                    if k in outputs:
                        raise ValueError(f"Duplicate output key {k!r} in ParallelBlock")
                    outputs[k] = v
            else:
                outputs[name] = out
        if self.post is not None:
            outputs = call_block(self.post, outputs, **kwargs)
        if self.aggregation is not None:
            return call_block(self.aggregation, outputs, **kwargs)
        return outputs

    def __getitem__(self, name: str) -> Block:
        return self.branches[name]

    def keys(self):
        return self.branches.keys()

    def items(self):
        return self.branches.items()

    def select_by_name(self, name: str) -> Optional[Block]:
        if self.block_name == name:
            return self
        # nnx.Dict KeysView.__contains__ raises AttributeError on a miss
        # (its __getitem__ uses getattr) — materialize the keys first
        if name in list(self.branches.keys()):
            return self.branches[name]
        for b in self.branches.values():
            found = getattr(b, "select_by_name", lambda n: None)(name)
            if found is not None:
                return found
        return None

    def select_by_tag(self, tags) -> Optional["ParallelBlock"]:
        """New ParallelBlock with only the branches whose schema matches the tags
        (reference ``combinators.py``); used e.g. to pull the item branch out of
        an input block."""
        keep = {}
        for name, b in self.branches.items():
            s = getattr(b, "schema", None)
            if s is not None and len(s.select_by_tag(tags)):
                keep[name] = b
        if not keep:
            return None
        return ParallelBlock(keep, aggregation=self.aggregation)

    def __repr__(self):
        return f"ParallelBlock({dict(self.branches)!r})"


class Filter(Block):
    """Select dict entries by schema / names / tags (reference ``tabular.py:494``)."""

    def __init__(self, selector, exclude: bool = False):
        if isinstance(selector, Schema):
            schema = selector
            names = set(schema.column_names)
            tags = None
        elif isinstance(selector, (list, tuple)) and selector and isinstance(selector[0], str) and not isinstance(selector[0], Tags):
            schema, names, tags = None, set(selector), None
        elif isinstance(selector, str) and not isinstance(selector, Tags):
            schema, names, tags = None, {selector}, None
        else:
            tags = selector if isinstance(selector, (list, tuple)) else [selector]
            schema, names = None, None
        super().__init__(schema=schema)
        self._names = names
        self._tags = [t.value if isinstance(t, Tags) else t for t in (tags or [])] or None
        self.exclude = exclude

    def __call__(self, inputs: TensorDict, **kwargs):
        if not isinstance(inputs, dict):
            return inputs
        if self._names is not None:
            keep = self._names
        elif self._tags is not None and self.schema is None:
            raise ValueError("Filter by tags requires set_schema() before calling")
        else:
            keep = set(self.schema.column_names)
        if self.exclude:
            return {k: v for k, v in inputs.items() if k not in keep}
        return {k: v for k, v in inputs.items() if k in keep}

    def set_schema(self, schema: Optional[Schema]):
        if schema is not None and self._tags is not None and self.schema is None:
            self.schema = schema.select_by_tag(self._tags)
        elif schema is not None and self._names is not None and self.schema is None:
            self.schema = schema.select_by_name(sorted(self._names))
        return self


class AsTabular(Block):
    """Wrap a tensor into a one-entry dict (reference ``tabular.py:615``)."""

    def __init__(self, output_name: str):
        super().__init__(block_name=output_name)
        self.output_name = output_name

    def __call__(self, inputs, **kwargs):
        return {self.output_name: inputs}


class ResidualBlock(Block):
    """out = inputs + block(inputs), optional activation (reference ``WithShortcut``)."""

    def __init__(self, block, activation=None):
        super().__init__()
        self.block = as_block(block)
        self.activation = activation

    def __call__(self, inputs, **kwargs):
        out = inputs + call_block(self.block, inputs, **kwargs)
        if self.activation is not None:
            import jax

            out = getattr(jax.nn, self.activation)(out)
        return out


class WithShortcut(Block):
    """Run block and keep the input as a named shortcut branch."""

    def __init__(
        self,
        block,
        shortcut_name: str = "shortcut",
        block_name_out: str = "output",
        aggregation=None,
    ):
        super().__init__()
        self.block = as_block(block)
        self.shortcut_name = shortcut_name
        self.block_name_out = block_name_out
        self.aggregation = TabularAggregation.parse(aggregation)

    def __call__(self, inputs, **kwargs):
        out = {
            self.block_name_out: call_block(self.block, inputs, **kwargs),
            self.shortcut_name: inputs,
        }
        if self.aggregation is not None:
            return call_block(self.aggregation, out, **kwargs)
        return out


class Cond(Block):
    """Functional if/else on a traced predicate (reference ``combinators.Cond``)."""

    def __init__(self, condition, true_block, false_block=None):
        super().__init__()
        self.condition = condition
        self.true_block = as_block(true_block)
        self.false_block = as_block(false_block) if false_block is not None else None

    def __call__(self, inputs, **kwargs):
        import jax

        pred = call_block(self.condition, inputs, **kwargs)
        t = call_block(self.true_block, inputs, **kwargs)
        f = (
            call_block(self.false_block, inputs, **kwargs)
            if self.false_block is not None
            else inputs
        )
        return jax.tree_util.tree_map(lambda a, b: jnp.where(pred, a, b), t, f)


class MapValues(Block):
    """Apply a block to every value of a dict input."""

    def __init__(self, block):
        super().__init__()
        self.block = as_block(block)

    def __call__(self, inputs, **kwargs):
        if isinstance(inputs, dict):
            return {k: call_block(self.block, v, **kwargs) for k, v in inputs.items()}
        return call_block(self.block, inputs, **kwargs)
