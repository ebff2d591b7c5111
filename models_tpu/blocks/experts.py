"""Multi-task mixture-of-experts blocks (reference ``merlin/models/tf/blocks/experts.py``):
MMOE (one softmax gate per task over shared experts, ``:137``) and PLE/CGC
(task-specific + shared expert groups, ``:212-489``).

Experts run as a single batched tensor (B, E, D) — stacked expert MLPs evaluated
in parallel; gates are tiny softmax matmuls. (These are *dense* per-replica experts
like the reference — not MoE-EP routing.)
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.block import Block, as_block, call_block, fresh_copy
from ..core.combinators import ParallelBlock, SequentialBlock
from .mlp import Dense, MLPBlock


class ExpertsGate(Block):
    """Softmax gate mixing stacked expert outputs (B, E, D) → (B, D)
    (reference ``ExpertsGate:38``)."""

    def __init__(self, num_experts: int, seed: int = 0):
        super().__init__()
        self.gate = Dense(num_experts, use_bias=False, seed=seed)

    def __call__(self, inputs, **kwargs):
        gate_input, experts = inputs  # (B, F), (B, E, D)
        weights = jax.nn.softmax(self.gate(gate_input), axis=-1)  # (B, E)
        return jnp.einsum("be,bed->bd", weights, experts)


class _StackedExperts(Block):
    """Run N expert blocks and stack outputs on axis 1."""

    def __init__(self, expert_block: Block, num_experts: int, name_prefix: str = "expert"):
        super().__init__()
        from ..core.block import iter_blocks

        experts = []
        for i in range(num_experts):
            e = expert_block if i == 0 else copy.deepcopy(expert_block)
            if i:
                # break init symmetry: deepcopy duplicates seeds, which would
                # make every (lazily-built) expert initialize identically —
                # the reference's Keras clone re-initializes instead
                for b in iter_blocks(e):
                    if isinstance(getattr(b, "seed", None), int):
                        b.seed = b.seed + 1009 * i
            experts.append(e)
        self.experts = nnx.List(experts)

    def __call__(self, inputs, *, training=False, context=None, **kwargs):
        outs = [
            call_block(e, inputs, training=training, context=context) for e in self.experts
        ]
        return jnp.stack(outs, axis=1)  # (B, E, D)


class MMOEBlock(Block):
    """Multi-gate mixture of experts: shared experts, one gate per task
    (reference ``MMOEBlock:137``). Output: dict task → (B, D) mixed representation,
    consumed by ``OutputBlock`` task towers."""

    def __init__(
        self,
        outputs: Sequence[str],
        expert_block,
        num_experts: int = 4,
        gate_block: Optional[Block] = None,
        seed: int = 0,
    ):
        super().__init__()
        if isinstance(expert_block, (list, tuple)):
            expert_block = MLPBlock(expert_block, seed=seed)
        self.experts = _StackedExperts(as_block(expert_block), num_experts)
        self.task_names = list(outputs)
        self.gates = nnx.Dict(
            {t: ExpertsGate(num_experts, seed=seed + i) for i, t in enumerate(self.task_names)}
        )

    def __call__(self, inputs, *, training=False, context=None, **kwargs):
        experts = self.experts(inputs, training=training, context=context)
        return {t: self.gates[t]((inputs, experts)) for t in self.task_names}


class CGCBlock(Block):
    """Customized Gate Control: per-task expert groups + shared experts
    (reference ``CGCBlock:340``). ``final_layer`` drops the shared branch output."""

    def __init__(
        self,
        outputs: Sequence[str],
        expert_block,
        num_task_experts: int = 1,
        num_shared_experts: int = 1,
        final_layer: bool = False,
        seed: int = 0,
    ):
        super().__init__()
        if isinstance(expert_block, (list, tuple)):
            expert_block = MLPBlock(expert_block, seed=seed)
        expert_block = as_block(expert_block)
        self.task_names = list(outputs)
        self.final_layer = final_layer
        # each group gets a RE-SEEDED DEEPCOPY template: plain deepcopy would
        # make the first expert of every group initialize identically, and
        # embedding the caller's instance directly would alias its parameters
        # with any other use of that object. Group salts are spaced 1009 apart
        # so they can never collide with PLE's per-layer salts (< 1009 apart).
        self.shared_experts = _StackedExperts(fresh_copy(expert_block, 0), num_shared_experts)
        self.task_experts = nnx.Dict(
            {
                t: _StackedExperts(fresh_copy(expert_block, 1009 * (j + 1)), num_task_experts)
                for j, t in enumerate(self.task_names)
            }
        )
        self.task_gates = nnx.Dict(
            {
                t: ExpertsGate(num_task_experts + num_shared_experts, seed=seed + i)
                for i, t in enumerate(self.task_names)
            }
        )
        if not final_layer:
            total = num_shared_experts + num_task_experts * len(self.task_names)
            self.shared_gate = ExpertsGate(total, seed=seed + 91)
        else:
            self.shared_gate = None

    def __call__(self, inputs, *, training=False, context=None, **kwargs):
        # inputs: tensor (first layer) or dict {task: x, "shared": x} (stacked CGC)
        def branch_input(name):
            if isinstance(inputs, dict):
                return inputs.get(name, inputs.get("shared"))
            return inputs

        shared_in = branch_input("shared")
        shared_out = self.shared_experts(shared_in, training=training, context=context)
        outs: Dict[str, jnp.ndarray] = {}
        task_outs = []
        for t in self.task_names:
            ti = branch_input(t)
            te = self.task_experts[t](ti, training=training, context=context)
            task_outs.append(te)
            mixed = self.task_gates[t]((ti, jnp.concatenate([te, shared_out], axis=1)))
            outs[t] = mixed
        if self.shared_gate is not None:
            all_experts = jnp.concatenate(task_outs + [shared_out], axis=1)
            outs["shared"] = self.shared_gate((shared_in, all_experts))
        return outs


def PLEBlock(
    outputs: Sequence[str],
    expert_block,
    num_layers: int = 2,
    num_task_experts: int = 1,
    num_shared_experts: int = 1,
    seed: int = 0,
) -> SequentialBlock:
    """Progressive Layered Extraction: stacked CGC layers (reference ``PLEBlock:489``)."""
    layers = [
        CGCBlock(
            outputs,
            expert_block
            if isinstance(expert_block, (list, tuple))
            else fresh_copy(expert_block, i),  # re-seeded per layer (salts < 1009)
            num_task_experts=num_task_experts,
            num_shared_experts=num_shared_experts,
            final_layer=(i == num_layers - 1),
            seed=seed + 13 * i,
        )
        for i in range(num_layers)
    ]
    return SequentialBlock(layers, block_name="PLEBlock")
