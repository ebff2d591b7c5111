"""V1 prediction tasks that are more than aliases.

``NextItemPredictionTask`` (reference ``tf/prediction_tasks/next_item.py``):
next-item prediction over the catalog with optional weight tying and sampled
softmax. Pair with a sequence transform as the fit ``pre`` —
``SequencePredictNext`` (causal) or ``SequenceMaskRandom`` (masked-LM).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

from flax import nnx

from ..blocks.mlp import Dense
from ..core.block import Block, as_block, call_block
from ..core.combinators import SequentialBlock
from ..schema import Schema, Tags
from .base import BinaryOutput, CategoricalOutput, ModelOutput, RegressionOutput
from .contrastive import ContrastiveOutput


def NextItemPredictionTask(
    schema: Schema,
    weight_tying: bool = True,
    table=None,
    sampled_softmax: bool = False,
    num_sampled: int = 100,
    logits_temperature: float = 1.0,
    target_name: Optional[str] = None,
) -> ModelOutput:
    """Next-item head over the item catalog (reference
    ``tf/prediction_tasks/next_item.py``).

    - ``weight_tying`` + ``table``: logits = hidden @ item_table.T (the
      reference's default); without a table a dense CategoricalOutput head over
      the item cardinality is built.
    - ``sampled_softmax``: popularity-sampled negatives with logQ correction
      instead of the full-catalog softmax.
    """
    item_col = schema.select_by_tag(Tags.ITEM_ID).first
    target = target_name or item_col.name
    if sampled_softmax:
        from .sampling import PopularityBasedSampler

        if table is None:
            raise ValueError("sampled_softmax needs the tied item EmbeddingTable")
        return ContrastiveOutput(
            table,
            negative_samplers=[
                PopularityBasedSampler(
                    max_num_samples=num_sampled, max_id=item_col.cardinality - 1
                )
            ],
            target=target,
            logits_temperature=logits_temperature,
        )
    if weight_tying and table is not None:
        return CategoricalOutput(
            table, target=target, logits_temperature=logits_temperature
        )
    return CategoricalOutput(
        item_col, target=target, logits_temperature=logits_temperature
    )

class ParallelPredictionBlock(Block):
    """V1 multi-task prediction container (reference
    ``tf/prediction_tasks/base.py:238-282``).

    Holds the per-task heads plus two V1-only facilities the V2 ``OutputBlock``
    does not carry:

    - ``bias_block``: a shared block whose output is projected to one logit
      (reference's ``bias_logit = Dense(1)``) and ADDED to every task's logits;
    - ``task_weight_dict``: per-task loss weights the engine picks up as
      defaults (``Model._loss_weight_for``) — compile(loss_weights=...) still
      overrides.

    Head iteration is key-sorted so eager and jitted traces match (NNX graph
    restore sorts dict keys — see CLAUDE.md).
    """

    def __init__(
        self,
        heads: Dict[str, ModelOutput],
        bias_block=None,
        task_weight_dict: Optional[Dict[str, float]] = None,
    ):
        super().__init__(block_name="parallel_prediction_block")
        self.heads = nnx.Dict(dict(heads))
        self.bias_block = as_block(bias_block) if bias_block is not None else nnx.data(None)
        self.bias_logit = Dense(1) if bias_block is not None else nnx.data(None)
        self.task_weight_dict = {str(k): float(v) for k, v in (task_weight_dict or {}).items()}

    def __call__(self, inputs, *, training=False, context=None, targets=None, **kwargs):
        bias = None
        if self.bias_block is not None:
            shared = call_block(
                self.bias_block, inputs, training=training, context=context
            )
            bias = self.bias_logit(shared)  # (B, 1)
        out = {}
        for name in sorted(self.heads):
            pred = call_block(
                self.heads[name], inputs,
                training=training, context=context, targets=targets,
            )
            if bias is not None and getattr(pred, "outputs", None) is not None:
                add = bias if pred.outputs.ndim >= 2 else bias[:, 0]
                pred = pred._replace(outputs=pred.outputs + add)
            out[name] = pred
        return out


def PredictionTasks(
    schema: Schema,
    task_blocks=None,
    task_weight_dict: Optional[Dict[str, float]] = None,
    task_pre_dict: Optional[Dict[str, Block]] = None,
    bias_block=None,
    logits_temperature: float = 1.0,
) -> ParallelPredictionBlock:
    """Multi-task V1 prediction block from TARGET-tagged schema columns
    (reference ``tf/prediction_tasks/multi.py:25-57`` +
    ``base.py ParallelPredictionBlock.from_schema``).

    - ``task_blocks``: dict target→tower, or a SINGLE block cloned per task
      with fresh parameters (reference clones via ``from_config(get_config())``),
      or a zero-arg factory callable;
    - ``task_pre_dict``: per-task pre block, applied AFTER the tower
      (reference ``pre_call`` order: task_block → pre → task layer);
    - ``task_weight_dict``: per-task loss weights (engine defaults);
    - ``bias_block``: shared bias added to every task's logits.
    """
    targets = schema.targets
    if not len(targets):
        raise ValueError("Schema has no TARGET-tagged columns")

    def tower_for(name, index):
        if task_blocks is None:
            return None
        if isinstance(task_blocks, dict):
            t = task_blocks.get(name)
            return as_block(t) if t is not None else None
        if isinstance(task_blocks, Block):
            # fresh params + distinct init seed per task (reference clones a
            # single task_blocks layer per task via from_config(get_config()))
            from ..core.block import fresh_copy

            return fresh_copy(task_blocks, salt=index + 1)
        if callable(task_blocks):
            return as_block(task_blocks())
        raise ValueError("task_blocks must be a Block, dict, or factory callable")

    heads: Dict[str, ModelOutput] = {}
    for i, col in enumerate(targets):
        parts = [b for b in (tower_for(col.name, i), (task_pre_dict or {}).get(col.name)) if b is not None]
        pre = None
        if len(parts) == 1:
            pre = parts[0]
        elif parts:
            pre = SequentialBlock(*[as_block(p) for p in parts])
        kw = dict(logits_temperature=logits_temperature)
        if pre is not None:
            kw["pre"] = as_block(pre)
        if col.has_tag(Tags.REGRESSION) or (
            col.dtype.startswith("float") and not col.has_tag(Tags.BINARY_CLASSIFICATION)
        ):
            head = RegressionOutput(col.name, **kw)
        elif col.has_tag(Tags.MULTI_CLASS_CLASSIFICATION) and col.int_domain:
            head = CategoricalOutput(col, **kw)
        else:
            head = BinaryOutput(col.name, **kw)
        heads[head.block_name] = head

    # map user task-weight keys (target names) onto head names
    weights = {}
    for k, v in (task_weight_dict or {}).items():
        matches = [h for h in heads if h == k or h.split("/")[0] == k]
        for h in matches or [k]:
            weights[h] = float(v)
    return ParallelPredictionBlock(heads, bias_block=bias_block, task_weight_dict=weights)
