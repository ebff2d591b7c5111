"""Multi-task model constructors: MMOE / PLE over any input block + OutputBlock
task towers (reference usage: ``merlin/models/tf/blocks/experts.py`` with
``OutputBlock`` per-task ``task_blocks``)."""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

from ..blocks.experts import CGCBlock, MMOEBlock, PLEBlock
from ..blocks.mlp import MLPBlock
from ..core.block import Block
from ..core.combinators import SequentialBlock
from ..inputs.base import InputBlockV2
from ..outputs.base import OutputBlock
from ..schema import Schema, Tags
from .base import Model


def _task_names(schema: Schema) -> list:
    return schema.targets.column_names


def MMOEModel(
    schema: Schema,
    expert_block: Union[Block, Sequence[int]] = (64, 32),
    num_experts: int = 4,
    task_blocks: Optional[Dict[str, Block]] = None,
    embedding_dim: Optional[int] = None,
    seed: int = 0,
) -> Model:
    tasks = _task_names(schema)
    if len(tasks) < 2:
        raise ValueError("MMOEModel expects >= 2 TARGET columns")
    body = SequentialBlock(
        [
            InputBlockV2(schema, dim=embedding_dim, seed=seed),
            MMOEBlock(tasks, expert_block, num_experts=num_experts, seed=seed),
        ]
    )
    model = Model(body, OutputBlock(schema, task_blocks=task_blocks), schema=schema)
    model.block_name = "mmoe"
    return model


def PLEModel(
    schema: Schema,
    expert_block: Union[Block, Sequence[int]] = (64, 32),
    num_layers: int = 2,
    num_task_experts: int = 1,
    num_shared_experts: int = 2,
    task_blocks: Optional[Dict[str, Block]] = None,
    embedding_dim: Optional[int] = None,
    seed: int = 0,
) -> Model:
    tasks = _task_names(schema)
    if len(tasks) < 2:
        raise ValueError("PLEModel expects >= 2 TARGET columns")
    body = SequentialBlock(
        [
            InputBlockV2(schema, dim=embedding_dim, seed=seed),
            PLEBlock(
                tasks,
                expert_block,
                num_layers=num_layers,
                num_task_experts=num_task_experts,
                num_shared_experts=num_shared_experts,
                seed=seed,
            ),
        ]
    )
    model = Model(body, OutputBlock(schema, task_blocks=task_blocks), schema=schema)
    model.block_name = "ple"
    return model
