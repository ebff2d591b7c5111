"""V1 prediction tasks that are more than aliases.

``NextItemPredictionTask`` (reference ``tf/prediction_tasks/next_item.py``):
next-item prediction over the catalog with optional weight tying and sampled
softmax. Pair with a sequence transform as the fit ``pre`` —
``SequencePredictNext`` (causal) or ``SequenceMaskRandom`` (masked-LM).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from ..schema import Schema, Tags
from .base import CategoricalOutput, ModelOutput
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
