"""ContrastiveOutput: sampled-softmax / in-batch-negatives training head.

Reference: ``merlin/models/tf/outputs/contrastive.py:47-469`` + false-negative
rescoring (``tf/utils/tf_utils.py:126``). Behavior matched:

- positive score = row-wise dot(query, positive-candidate);
- negative scores = query @ negatives.T — one (B,D)x(D,N) MXU matmul;
- logQ correction ``logits -= log(sampling_prob + eps)`` on negatives;
- false negatives (sampled id == positive id) down-scored to ``MIN_FLOAT``;
- emits ``Prediction(outputs=[pos|negs] (B,1+N), targets=one-hot col 0)``.

Modes: two-tower (inputs = {"query","candidate"}) or weight-tying with an
:class:`EmbeddingTable` (inputs = query embeddings; candidates from the table).
When called without targets (pure inference) it falls back to plain scoring:
row-wise dot (two-tower) or full-catalog logits (tying).

The fused Pallas kernel variant (ops/contrastive.py) plugs in under the same API
for large N where materializing (B, 1+N) logits in HBM is the bottleneck.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from ..core.block import Block
from ..core.types import Prediction
from ..metrics.topk import TopKMetricsAggregator
from ..schema import ColumnSchema, Schema, Tags
from .base import DotProduct, EmbeddingTablePrediction, ModelOutput
from .sampling import Candidate, CandidateSampler, InBatchSampler

from ..core.constants import LOGQ_EPS, MIN_FLOAT


class ContrastiveOutput(ModelOutput):
    default_loss = "categorical_crossentropy"

    def __init__(
        self,
        to_call=None,
        negative_samplers: Union[str, CandidateSampler, Sequence, None] = "in-batch",
        target: Optional[str] = None,
        downscore_false_negatives: bool = True,
        logq_sampling_correction: bool = True,
        logits_temperature: float = 1.0,
        default_metrics_top_ks: Sequence[int] = (10,),
        query_name: str = "query",
        candidate_name: str = "candidate",
        fused_loss: str = "auto",
        fused_tile: int = 2048,
        **kwargs,
    ):
        from ..inputs.embedding import EmbeddingTable

        col_schema: Optional[ColumnSchema] = None
        table = None
        if isinstance(to_call, ColumnSchema):
            col_schema = to_call
            target = target or to_call.name
            to_call = None
        elif isinstance(to_call, Schema):
            col_schema = to_call.item_id_column
            target = target or col_schema.name
            to_call = None
        elif isinstance(to_call, EmbeddingTable):
            table = to_call
            col_schema = table.schema.first
            target = target or col_schema.name
            to_call = None
        self.col_schema = col_schema
        self.table = table

        if isinstance(negative_samplers, (str, CandidateSampler)):
            negative_samplers = [negative_samplers]
        from flax import nnx as _nnx

        # nnx.List: samplers may hold device state (e.g. the cross-batch FIFO
        # queue's ring buffer) which a plain-list static attribute rejects
        self.samplers = _nnx.List(CandidateSampler.parse(s) for s in (negative_samplers or []))
        if not len(self.samplers):
            raise ValueError("ContrastiveOutput needs at least one negative sampler")
        # catalog-aware samplers (e.g. "popularity") inherit the item domain from
        # the head's column schema when not explicitly configured (the reference
        # wires num_classes from the schema the same way)
        if col_schema is not None and col_schema.cardinality:
            from .sampling import PopularityBasedSampler

            for s in self.samplers:
                if isinstance(s, PopularityBasedSampler) and s.max_id is None:
                    s.max_id = int(col_schema.cardinality) - 1

        self.downscore_false_negatives = downscore_false_negatives
        self.logq_sampling_correction = logq_sampling_correction
        self.query_name = query_name
        self.candidate_name = candidate_name
        self.top_ks = tuple(default_metrics_top_ks)
        # fused blockwise CE ("auto" = on train steps that don't need logits for
        # metrics): ~2x step time on large batches — the (B, 1+N) logit matrix
        # never round-trips HBM (ops/contrastive.py)
        self.fused_loss = fused_loss
        self.fused_tile = int(fused_tile)
        super().__init__(
            to_call=None, target=target, logits_temperature=logits_temperature, **kwargs
        )
        # keep a reference for weight-tying AFTER super().__init__ (nnx attr)
        if self.table is not None:
            self.tying = EmbeddingTablePrediction(self.table)
        else:
            self.tying = None

    # ------------------------------------------------------------------
    def default_metrics(self):
        return [TopKMetricsAggregator.default(k) for k in self.top_ks]

    @property
    def item_id_name(self) -> Optional[str]:
        return self.col_schema.name if self.col_schema is not None else self.target

    def _row_valid(self, context):
        from ..data.loader import ROW_VALID_KEY

        if context is None:
            return None
        rv = context.features.get(ROW_VALID_KEY)
        return None if rv is None else rv.astype(bool)

    def _resolve_positive_ids(self, context, targets):
        """Positive item ids: explicit targets beat batch features. Returns
        (ids, prediction_weights) — for sequence targets the ids are the target
        SequenceFeature's values and the weights its prediction mask."""
        from ..core.types import SequenceFeature

        source = None
        if isinstance(targets, dict) and self.item_id_name in targets:
            source = targets[self.item_id_name]
        elif targets is not None and not isinstance(targets, dict):
            source = targets
        elif context is not None and self.item_id_name:
            source = context.features.get(self.item_id_name)
        if isinstance(source, SequenceFeature):
            return source.values, source.mask.astype(jnp.float32)
        return source, None

    def _query_and_positive(self, inputs, context, targets):
        """Resolve (query_emb (Q, D), positive Candidate, weights (Q,) or None).

        Sequence queries (B, L, D) flatten to (B*L, D): every position is a query,
        padding/unmasked positions zero-weighted — static shapes, no gather.
        """
        from ..core.types import SequenceFeature

        pos_id, weights = self._resolve_positive_ids(context, targets)
        row_valid = self._row_valid(context)
        if isinstance(inputs, dict):
            query = inputs[self.query_name]
            cand = inputs.get(self.candidate_name)
            return query, Candidate(id=pos_id, embedding=cand, valid=row_valid), weights

        query = inputs
        qmask = None
        if isinstance(query, SequenceFeature):
            qmask = query.mask
            query = query.values
        if self.tying is None:
            raise ValueError(
                "ContrastiveOutput with tensor input requires an EmbeddingTable "
                "(weight tying) or dict {'query','candidate'} inputs"
            )
        if query.ndim == 3:
            B, L, D = query.shape
            if pos_id is not None and pos_id.ndim == 1:
                # scalar targets (predict-last/random protocols): the query is the
                # hidden state at the last valid input position
                from ..core.aggregation import sequence_last
                from ..core.types import SequenceFeature as _SF

                m = qmask if qmask is not None else jnp.ones((B, L), dtype=bool)
                query = sequence_last(_SF(query, m))
            else:
                query = query.reshape(B * L, D)
                if pos_id is not None and pos_id.ndim == 2:
                    pos_id = pos_id.reshape(B * L)
                if weights is not None:
                    weights = weights.reshape(B * L)
                elif qmask is not None:
                    weights = qmask.astype(jnp.float32).reshape(B * L)
        if pos_id is None:
            raise ValueError(
                f"ContrastiveOutput needs feature/target {self.item_id_name!r} "
                "to identify positives"
            )
        emb = self.tying.embedding_lookup(pos_id, site="pos", context=context)
        if (
            row_valid is not None
            and pos_id.shape[0] != row_valid.shape[0]
            and pos_id.shape[0] % row_valid.shape[0] == 0
        ):
            row_valid = jnp.repeat(row_valid, pos_id.shape[0] // row_valid.shape[0])
        return query, Candidate(id=pos_id, embedding=emb, valid=row_valid), weights

    def _sample_negatives(self, positive: Candidate, training, step, context=None) -> Candidate:
        negs: List[Candidate] = []
        for sampler in self.samplers:
            c = sampler(positive, training=training, step=step, context=context)
            if c.embedding is None:
                if self.tying is None:
                    raise ValueError(
                        f"Sampler {type(sampler).__name__} returned ids only; "
                        "embedding lookup requires weight tying"
                    )
                c = c._replace(embedding=self.tying.embedding_lookup(c.id, site="neg", context=context))
            negs.append(c)
        if len(negs) == 1:
            return negs[0]
        ids = jnp.concatenate([c.id for c in negs], axis=0)
        emb = jnp.concatenate([c.embedding for c in negs], axis=0)
        probs = None
        if all(c.sampling_prob is not None for c in negs):
            probs = jnp.concatenate([c.sampling_prob for c in negs], axis=0)
        valid = None
        if any(c.valid is not None for c in negs):
            valid = jnp.concatenate(
                [c.valid if c.valid is not None else jnp.ones(c.id.shape[0], bool) for c in negs],
                axis=0,
            )
        return Candidate(id=ids, embedding=emb, sampling_prob=probs, valid=valid)

    def contrastive_logits(self, query, positive: Candidate, negatives: Candidate):
        from ..core.policy import cast_compute

        pos_score = jnp.einsum(
            "bd,bd->b",
            cast_compute(query),
            cast_compute(positive.embedding),
            preferred_element_type=jnp.float32,
        )[:, None]  # (B,1)
        if self.logq_sampling_correction and positive.sampling_prob is not None:
            # the reference corrects the POSITIVE score too
            # (tf/outputs/contrastive.py:317)
            pos_score = pos_score - jnp.log(positive.sampling_prob + LOGQ_EPS)[:, None]
        neg_scores = jnp.matmul(
            cast_compute(query), cast_compute(negatives.embedding).T,
            preferred_element_type=jnp.float32,
        )  # (B,N)
        if self.logq_sampling_correction and negatives.sampling_prob is not None:
            neg_scores = neg_scores - jnp.log(negatives.sampling_prob + LOGQ_EPS)[None, :]
        if self.downscore_false_negatives and positive.id is not None and negatives.id is not None:
            false_neg = negatives.id[None, :] == positive.id[:, None]  # (B,N)
            neg_scores = jnp.where(false_neg, MIN_FLOAT, neg_scores)
        if negatives.valid is not None:
            # padded tail-batch rows must not act as negatives (drop_last=False)
            neg_scores = jnp.where(negatives.valid[None, :], neg_scores, MIN_FLOAT)
        return jnp.concatenate([pos_score, neg_scores], axis=1)

    # ------------------------------------------------------------------
    def __call__(self, inputs, *, training=False, context=None, targets=None, **kwargs):
        step = context.get("step") if context is not None else None

        use_contrastive = training or targets is not None or (
            context is not None and context.get("testing", False)
        )
        if use_contrastive:
            query, positive, weights = self._query_and_positive(inputs, context, targets)
            if positive.id is not None:
                negatives = self._sample_negatives(positive, training, step, context=context)
                if (
                    self.logq_sampling_correction
                    and len(self.samplers) == 1
                    and positive.sampling_prob is None
                ):
                    # reference parity: samplers that know their analytic
                    # distribution stamp the POSITIVE's sampling prob as well
                    # (``sampler.with_sampling_probs(positive)``,
                    # tf/outputs/contrastive.py:384)
                    spfn = getattr(self.samplers[0], "sampling_probs", None)
                    max_id = getattr(self.samplers[0], "max_id", None)
                    if spfn is not None and max_id is not None:
                        positive = positive._replace(
                            sampling_prob=spfn(positive.id, max_id)
                        )

                # fused flash-style CE when logits aren't needed downstream
                need_logits = bool(context.get("need_logits", True)) if context is not None else True
                fused_ok = (
                    self.fused_loss in ("auto", True)
                    and training
                    and not need_logits
                    and negatives.embedding is not None
                    and positive.embedding is not None
                    # a post block (e.g. ContrastiveSampleWeight) operates on
                    # the materialized Prediction — incompatible with the
                    # fused loss, which never materializes the logits
                    and self.post is None
                )
                if fused_ok:
                    from ..data.loader import ROW_VALID_KEY
                    from ..ops.contrastive import sampled_softmax_loss

                    w = weights
                    rv = context.features.get(ROW_VALID_KEY) if context is not None else None
                    if rv is not None:
                        rvf = rv.astype(jnp.float32)
                        if query.shape[0] != rvf.shape[0] and query.shape[0] % rvf.shape[0] == 0:
                            rvf = jnp.repeat(rvf, query.shape[0] // rvf.shape[0])
                        w = rvf if w is None else w * rvf
                    temp = self.logits_scaler.temperature if self.logits_scaler else 1.0
                    neg_bias = None
                    neg_emb_fused = negatives.embedding
                    if self.logq_sampling_correction and negatives.sampling_prob is not None:
                        neg_bias = -jnp.log(negatives.sampling_prob + LOGQ_EPS)
                    if negatives.valid is not None:
                        # REPLACE semantics like the non-fused path (line
                        # ~255), not additive: an invalid row whose raw dot
                        # exceeds |MIN_FLOAT| would survive an additive bias.
                        # The fused kernel takes bias additively, so zero the
                        # invalid embeddings (score exactly 0) AND pin the
                        # bias to MIN_FLOAT — logit = MIN_FLOAT/T, suppressed.
                        neg_emb_fused = jnp.where(
                            negatives.valid[:, None], neg_emb_fused, 0.0
                        )
                        neg_bias = jnp.where(
                            negatives.valid,
                            0.0 if neg_bias is None else neg_bias,
                            MIN_FLOAT,
                        )
                    from ..core.policy import cast_compute as _cc

                    pos_bias = None
                    if self.logq_sampling_correction and positive.sampling_prob is not None:
                        pos_bias = -jnp.log(positive.sampling_prob + LOGQ_EPS)
                    loss = sampled_softmax_loss(
                        _cc(query),
                        _cc(positive.embedding),
                        _cc(neg_emb_fused),
                        positive.id if self.downscore_false_negatives else None,
                        negatives.id if self.downscore_false_negatives else None,
                        w,
                        neg_bias,
                        temp,
                        min(self.fused_tile, neg_emb_fused.shape[0]),
                        pos_bias=pos_bias,
                    )
                    return Prediction(outputs=loss, precomputed_loss=loss)

                logits = self.contrastive_logits(query, positive, negatives)
                if self.logits_scaler is not None:
                    logits = self.logits_scaler(logits)
                onehot = jnp.zeros_like(logits).at[:, 0].set(1.0)
                pred = Prediction(
                    outputs=logits,
                    targets=onehot,
                    sample_weight=weights,
                    negative_candidate_ids=negatives.id,
                )
                if self.post is not None:
                    from ..core.block import call_block

                    pred = call_block(
                        self.post, pred, training=training, context=context, targets=targets
                    )
                return pred

        # inference: plain scoring
        from ..core.types import SequenceFeature

        if isinstance(inputs, dict):
            logits = jnp.sum(
                inputs[self.query_name] * inputs[self.candidate_name], axis=-1, keepdims=True
            )
        else:
            query = inputs.values if isinstance(inputs, SequenceFeature) else inputs
            logits = self.tying(query)  # full catalog (B[, L], num_items)
        if self.logits_scaler is not None:
            logits = self.logits_scaler(logits)
        return Prediction(outputs=logits, targets=self.bind_target(targets))

    def to_dataset(self):
        """Export the tied candidate embeddings."""
        if self.table is None:
            raise ValueError("No tied embedding table to export")
        return self.table.to_dataset()


class ContrastiveSampleWeight(Block):
    """Per-candidate sample weights for contrastive training
    (reference ``tf/experimental/sample_weight.py:29``).

    Attach as ``ContrastiveOutput(..., post=ContrastiveSampleWeight(...))``:
    rewrites the head Prediction's ``sample_weight`` into a (B, 1+N) matrix
    over the [pos|negs] logit layout (multiplied into any rowwise weight the
    head already produced, e.g. sequence prediction masks).

    - ``pos_class_weight``: str → per-interaction weight read from that
      feature column; array of shape (num_candidates,) → per-candidate weight
      gathered by the positive's id; float → one constant for all positives.
    - ``neg_class_weight``: array (num_candidates,) → gathered by the sampled
      negative ids; float → one constant for all negatives.

    2-D weight semantics downstream (``losses.py::_weighted_mean``):
    elementwise losses ("binary_crossentropy") weight each [pos|neg] element;
    pairwise losses weight pair *i* by ``w_pos * w_neg_i``; rowwise losses
    (softmax CE) reduce to the positive column. Metrics always use the
    positive column as the per-example weight.
    """

    def __init__(
        self,
        pos_class_weight,
        neg_class_weight=1.0,
        schema: Optional[Schema] = None,
        candidate_tag_id: Tags = Tags.ITEM_ID,
    ):
        from flax import nnx

        super().__init__()
        self.candidate_id_name = None
        if schema is not None:
            sel = schema.select_by_tag(candidate_tag_id)
            if len(sel):
                self.candidate_id_name = sel.first.name
        if isinstance(pos_class_weight, (str, int, float)):
            self.pos_class_weight = pos_class_weight
            self.pos_table = nnx.data(None)
        else:
            if self.candidate_id_name is None:
                raise ValueError(
                    "per-candidate pos_class_weight needs schema= with a "
                    f"{candidate_tag_id}-tagged candidate-id column"
                )
            self.pos_class_weight = None
            self.pos_table = nnx.Variable(jnp.asarray(pos_class_weight, dtype=jnp.float32))
        if isinstance(neg_class_weight, (int, float)):
            self.neg_class_weight = float(neg_class_weight)
            self.neg_table = nnx.data(None)
        else:
            self.neg_class_weight = None
            self.neg_table = nnx.Variable(jnp.asarray(neg_class_weight, dtype=jnp.float32))

    def _positive_ids(self, context, targets):
        ids = None
        if context is not None:
            ids = context.features.get(self.candidate_id_name)
        if ids is None and isinstance(targets, dict):
            ids = targets.get(self.candidate_id_name)
        if ids is None:
            raise ValueError(
                f"candidate-id column {self.candidate_id_name!r} not found in "
                "features/targets (needed to gather per-candidate positive weights)"
            )
        return ids

    def __call__(self, inputs, *, context=None, targets=None, **kwargs):
        if not isinstance(inputs, Prediction) or inputs.outputs is None:
            return inputs
        logits = inputs.outputs
        if logits.ndim != 2 or logits.shape[1] < 2:
            return inputs  # not a [pos|negs] contrastive layout
        batch, width = logits.shape
        n_negs = width - 1

        if self.pos_table is not None:
            ids = self._positive_ids(context, targets).astype(jnp.int32).reshape(-1)
            pos = self.pos_table.value[ids].reshape(-1, 1)
        elif isinstance(self.pos_class_weight, str):
            col = context.features.get(self.pos_class_weight) if context is not None else None
            if col is None:
                raise ValueError(
                    "The model's inputs don't contain the positive weight "
                    f"feature {self.pos_class_weight!r}."
                )
            pos = col.astype(jnp.float32).reshape(-1, 1)
        else:
            pos = jnp.full((batch, 1), float(self.pos_class_weight), dtype=jnp.float32)

        if self.neg_table is not None:
            neg_ids = inputs.negative_candidate_ids
            if neg_ids is None:
                raise ValueError(
                    "per-candidate neg_class_weight needs the head to emit "
                    "negative_candidate_ids"
                )
            ids = neg_ids.astype(jnp.int32)
            nw = self.neg_table.value[ids.reshape(-1)].reshape(ids.shape)
            # in-batch negatives are shared across rows: (N,) → (B, N)
            neg = jnp.broadcast_to(nw.reshape(1, -1), (batch, n_negs)) if nw.ndim == 1 else nw
        else:
            neg = jnp.full((batch, n_negs), self.neg_class_weight, dtype=jnp.float32)

        w = jnp.concatenate([pos, neg], axis=1)
        prev = inputs.sample_weight
        if prev is not None:
            prev = prev.astype(jnp.float32)
            prev = prev.reshape(prev.shape[0], -1)
            w = w * (prev[:, :1] if prev.shape[1] == 1 else prev)
        return inputs._replace(sample_weight=w)
