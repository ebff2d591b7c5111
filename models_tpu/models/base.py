"""Model: the training/eval/inference engine (L5).

Reference: ``merlin/models/tf/models/base.py`` (BaseModel.compile/fit/evaluate/
predict:311-1618, Model:1621). TPU-native redesign:

- **one eager build pass** materializes lazy params from a sample batch, then the
  graph is split (``nnx.split``) into graphdef + params + mutable state and the
  train/eval/predict steps are **pure jitted functions with donated state** — zero
  Python in the hot loop beyond feeding numpy batches (which JAX transfers
  asynchronously, overlapping host→device copy with device compute);
- losses/metrics are pure functions threaded through the step (no Keras mutable
  metric variables); metric state is a small pytree updated on-device;
- ``train_metrics_steps`` (reference ``MetricsComputeCallback:119``) compiles two
  step variants (with/without metric updates) instead of branching on a flag;
- Horovod's rank logic is replaced by the ``parallel`` module's mesh shardings —
  ``fit`` works unchanged on 1 chip or a mesh.
"""

from __future__ import annotations

import time
import weakref
from collections import deque
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from ..core.block import Block, as_block, call_block, iter_blocks
from ..core.combinators import ParallelBlock, SequentialBlock
from ..core.types import ModelContext, Prediction, SequenceFeature, TopKPrediction, to_device_batch
from ..data.dataset import Dataset
from ..data.loader import Loader, ROW_VALID_KEY
from ..losses import get_loss
from ..metrics.base import MeanMetric, Metric
from ..metrics.topk import TopKMetric, TopKMetricsAggregator
from ..outputs.base import ModelOutput
from ..schema import Schema


# datasets holding device-resident eval packs (weakrefs), oldest first —
# bounds pinned HBM; see BaseModel._pack_for_eval
_EVAL_PACK_LRU: deque = deque()

# same bound for device-resident TRAINING packs (cached on the dataset so
# consecutive fit() calls skip the up-to-2GB re-upload through the tunnel)
_TRAIN_PACK_LRU: deque = deque()

# optimizer slots persisted across fit() calls, keyed weakly by model:
# (opt_state, tx, param_fingerprint, mesh_fingerprint, global_step).
# A side table instead of a module attribute — the nnx pytree must not carry
# optimizer arrays (they would ride through the train step's ``rest`` state),
# and weak keys free the HBM when the model is garbage collected.
_FIT_STATE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _resolve_optimizer(optimizer, learning_rate: Optional[float]) -> optax.GradientTransformation:
    if isinstance(optimizer, optax.GradientTransformation):
        return optimizer
    lr = learning_rate if learning_rate is not None else 1e-3
    table = {
        "adam": lambda: optax.adam(lr),
        "adamw": lambda: optax.adamw(lr),
        "adagrad": lambda: optax.adagrad(lr),
        "sgd": lambda: optax.sgd(lr),
        "rmsprop": lambda: optax.rmsprop(lr),
        "lamb": lambda: optax.lamb(lr),
        # factored second moments: optimizer state is O(N + D) per table
        # instead of O(N x D) — big HBM-traffic win for embedding-heavy models
        "adafactor": lambda: optax.adafactor(lr),
    }
    if optimizer not in table:
        raise ValueError(f"Unknown optimizer {optimizer!r}; options {sorted(table)}")
    return table[optimizer]()


def _embedding_param_type():
    from ..inputs.embedding import EmbeddingParam

    return EmbeddingParam


def _auto_loss(loss_fn: Callable, labels, logits, sample_weight):
    """Dispatch dense-vs-sparse categorical CE automatically."""
    from ..losses import categorical_crossentropy, sparse_categorical_crossentropy

    if loss_fn is categorical_crossentropy and labels is not None:
        if labels.ndim == logits.ndim - 1 or (
            labels.ndim == logits.ndim and labels.shape[-1] == 1 and logits.shape[-1] > 1
        ):
            return sparse_categorical_crossentropy(labels, logits, sample_weight)
    return loss_fn(labels, logits, sample_weight)



def _unwrap_targets(pred):
    """SequenceFeature targets -> (values, prediction-mask weight)."""
    t, sw = pred.targets, pred.sample_weight
    if isinstance(t, SequenceFeature):
        m = t.mask.astype(jnp.float32)
        sw = m if sw is None else sw * m
        t = t.values
    return t, sw


def _slice_build_batch(x, y, cap: int = 32):
    """Thin the leading (batch) axis of a build batch to at most ``cap`` rows.

    Build runs eagerly: contrastive heads materialize the full (Q, N) in-batch
    logits matrix there, which at flattened-sequence scale (B*L ~ 65k) is
    tens of GB. Every other axis (sequence length, feature dims) is kept, so
    lazily-built param shapes are unaffected."""

    def cut(a):
        if a is None:
            return a
        if isinstance(a, SequenceFeature):
            return SequenceFeature(cut(a.values), cut(a.mask))
        if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] > cap:
            return a[:cap]
        return a

    sl = lambda t: jax.tree_util.tree_map(
        cut, t, is_leaf=lambda v: v is None or isinstance(v, SequenceFeature)
    )
    return sl(x), sl(y)


def _merge_row_valid(sw, row_valid, lead_dim):
    """Combine head sample-weights with the loader's row-validity mask, handling
    flattened-sequence leading dims ((B*L,) outputs vs (B,) validity)."""
    if row_valid is None:
        return sw
    rv = row_valid.astype(jnp.float32)
    if sw is None:
        if lead_dim != rv.shape[0] and lead_dim % rv.shape[0] == 0:
            rv = jnp.repeat(rv, lead_dim // rv.shape[0])
        return rv
    if sw.shape[0] == rv.shape[0]:
        if sw.ndim > 1:
            rv = rv.reshape((rv.shape[0],) + (1,) * (sw.ndim - 1))
        return sw * rv
    if sw.shape[0] % rv.shape[0] == 0:
        return sw * jnp.repeat(rv, sw.shape[0] // rv.shape[0])
    return sw


def _fetch_scalars(values: Dict[str, Any]) -> Dict[str, float]:
    """Fetch a dict of (device or host) scalars in a single transfer."""
    if not values:
        return {}
    names = list(values)
    stacked = jnp.stack([jnp.asarray(values[n], jnp.float32).reshape(()) for n in names])
    host = np.asarray(stacked)
    return {n: float(v) for n, v in zip(names, host)}


def _mesh_prefetch(iterator, mesh, depth: int = 1):
    """Device prefetch for mesh training: shard_batch one batch ahead so the
    host→device placement overlaps the current step (fit(mesh=) previously ran
    transfers synchronously)."""
    import collections

    from ..parallel.mesh import shard_batch

    queue = collections.deque()
    for x, y in iterator:
        queue.append((shard_batch(to_device_batch(x), mesh), shard_batch(y, mesh)))
        if len(queue) > depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def _device_prefetch(iterator, depth: int = 1):
    """Keep ``depth`` batches in flight to the device: ``jax.device_put`` is
    async, so the next batch's host→device transfer overlaps the current step's
    compute — the double-buffering role of the reference's GPU dataloader."""
    import collections

    def put(item):
        x, y = item
        x = to_device_batch(x)
        if isinstance(y, dict):
            y = {k: jnp.asarray(v) for k, v in y.items()}
        elif y is not None:
            y = jnp.asarray(y)
        return x, y

    queue = collections.deque()
    for item in iterator:
        queue.append(put(item))
        if len(queue) > depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


class History:
    def __init__(self):
        self.history: Dict[str, List[float]] = {}

    def append(self, logs: Dict[str, float]):
        for k, v in logs.items():
            self.history.setdefault(k, []).append(float(v))

    def __repr__(self):
        return f"History({ {k: [round(x, 4) for x in v] for k, v in self.history.items()} })"


class BaseModel(Block):
    """compile/fit/evaluate/predict engine over an arbitrary block graph."""

    def __init__(self, schema: Optional[Schema] = None):
        super().__init__(schema=schema)
        self._compiled = False
        self._built = False
        self.stop_training = False
        # nnx.data: assigned a Block by fit/evaluate/predict(pre=...) later —
        # a bare None-first assignment would freeze the slot static (CLAUDE.md)
        self._pre_transform = nnx.data(None)

    # ------------------------------------------------------------------
    # forward plumbing — subclasses define __call__
    # ------------------------------------------------------------------
    def heads(self) -> List[ModelOutput]:
        return [b for b in iter_blocks(self) if isinstance(b, ModelOutput)]

    def build(self, data) -> "BaseModel":
        """Eager forward on one batch to materialize lazy params."""
        if self._built:
            return self
        if isinstance(data, (Dataset, Loader)):
            from ..data.loader import sample_batch

            x, y = sample_batch(
                data,
                batch_size=2 if isinstance(data, Dataset) else data.batch_size,
                to_device=False,
            )
        else:
            x, y = data if isinstance(data, tuple) else (data, None)
        # The build pass runs EAGERLY — paths that stream under jit (the fused
        # contrastive loss) materialize here. At bucket-64 sessions the eager
        # in-batch logits matrix is (B*L, B*L) = 17 GB and OOMs the chip
        # (observed r5), so build on a thin row slice: param shapes never
        # depend on the batch dim, and sequence length / padding layout are
        # preserved because the slice keeps every other axis.
        x, y = _slice_build_batch(x, y, cap=32)
        x = to_device_batch(x)
        if isinstance(y, dict):
            y = {k: jnp.asarray(v) for k, v in y.items()}
        elif y is not None:
            y = jnp.asarray(y)
        from ..utils.io import spec_of

        self._build_spec = spec_of((x, y))  # replayed by declarative load
        self(x, targets=y, training=False)
        self._rekey_stateful_blocks()
        self._built = True
        return self

    def _rekey_stateful_blocks(self) -> None:
        """Give every stateful block (BatchNorm, FIFO queues, ...) a unique
        traversal-position state key BEFORE the graphdef is captured: deepcopy
        (expert stacking, tower copying, Block.repeat) duplicates the
        constructor-counter keys, and copies sharing a key would collapse onto
        one functional state-update slot (all but one silently frozen)."""
        i = 0
        for b in iter_blocks(self):
            if getattr(b, "state_update_targets", None) is not None and getattr(
                b, "_state_key", None
            ) is not None:
                b._state_key = f"state_{i}_{type(b).__name__}"
                i += 1

    # ------------------------------------------------------------------
    # compile
    # ------------------------------------------------------------------
    def compile(
        self,
        optimizer: Union[str, optax.GradientTransformation] = "adam",
        loss: Union[None, str, Callable, Dict[str, Any]] = None,
        metrics: Union[None, Sequence, Dict[str, Sequence]] = None,
        loss_weights: Optional[Dict[str, float]] = None,
        learning_rate: Union[None, float, Callable] = None,
        train_metrics_steps: int = 1,
        embedding_optimizer=None,
        sparse_threshold: Optional[int] = None,
        jit: bool = True,
        steps_per_execution: int = 1,
        class_weight: Optional[Dict] = None,
        optimizer_state_dtype=None,
    ) -> "BaseModel":
        from ..blocks.optimizer import (
            MultiOptimizer,
            SparseEmbeddingOptimizer,
            low_precision_optimizer_state,
        )

        if isinstance(optimizer, MultiOptimizer):
            self._tx = optimizer  # built over params at fit time
        else:
            self._tx = _resolve_optimizer(optimizer, learning_rate)
        if optimizer_state_dtype is not None:
            if isinstance(self._tx, MultiOptimizer):
                raise ValueError(
                    "optimizer_state_dtype: wrap the individual transforms of a "
                    "MultiOptimizer with low_precision_optimizer_state instead"
                )
            self._tx = low_precision_optimizer_state(self._tx, optimizer_state_dtype)
        # the compiled transform; fit() derives its per-run effective _tx from
        # this (MultiOptimizer build, frozen-block zeroing) without mutating it
        self._base_tx = self._tx
        if isinstance(embedding_optimizer, str):
            kind = embedding_optimizer.replace("lazy_", "").replace("sparse_", "")
            embedding_optimizer = SparseEmbeddingOptimizer(
                kind, learning_rate=learning_rate if learning_rate is not None else 0.05
            )
        self._emb_opt = embedding_optimizer
        # size-based sparse/dense routing (reference split_embeddings_on_size):
        # tables at or below the threshold ride the dense optimizer — the
        # row-sparse update's sort+scatter fixed costs only win above ~1M rows
        # on this chip (CLAUDE.md crossover). Low-precision tables are always
        # routed sparse (stochastic rounding needs the scatter-write path).
        self._sparse_threshold = sparse_threshold
        self._loss_spec = loss
        self._metrics_spec = metrics
        self._loss_weights = loss_weights or {}
        self._class_weight = class_weight
        self.train_metrics_steps = train_metrics_steps
        self._steps_per_execution = max(int(steps_per_execution), 1)
        self._jit = jit
        self._compiled = True
        # every compiled-artifact cache must die with compile(): each closes
        # over the optimizer/loss/metric state resolved at build time, and a
        # stale hit silently trains with the OLD compile settings
        self._step_cache: Dict[str, Any] = {}
        self._fused_fit_cache: Dict[Any, Any] = {}
        self._epoch_log_cache: Dict[Any, Any] = {}
        self._pre_jit_cache: Dict[Any, Any] = {}
        # optimizer slots persist across fit() calls; recompile resets them
        _FIT_STATE.pop(self, None)
        self._mesh = getattr(self, "_mesh", None)
        return self

    def _resolve_task_losses(self) -> Dict[str, Callable]:
        heads = self.heads()
        out: Dict[str, Callable] = {}
        for head in heads:
            name = head.block_name
            spec = self._loss_spec
            if isinstance(spec, dict):
                spec = spec.get(name) or spec.get(head.target)
            if spec is not None:
                out[name] = get_loss(spec)
            elif head.default_loss is not None:
                out[name] = get_loss(head.default_loss)
        return out

    def _resolve_task_metrics(self) -> Dict[str, List[Metric]]:
        heads = self.heads()
        out: Dict[str, List[Metric]] = {}
        for head in heads:
            name = head.block_name
            spec = self._metrics_spec
            if isinstance(spec, dict):
                spec = spec.get(name) or spec.get(head.target)
            if spec is None:
                ms = head.default_metrics()
            else:
                if not isinstance(spec, (list, tuple)):
                    spec = [spec]
                ms = [Metric.parse(m) for m in spec]
            out[name] = ms
        return out

    # ------------------------------------------------------------------
    # functional step builders
    # ------------------------------------------------------------------
    def _as_pred_dict(self, preds) -> Dict[str, Prediction]:
        if isinstance(preds, Prediction):
            heads = self.heads()
            name = heads[0].block_name if heads else "output"
            return {name: preds}
        if isinstance(preds, dict):
            return {k: v for k, v in preds.items() if isinstance(v, Prediction)}
        raise TypeError(f"Model produced {type(preds)}; expected Prediction or dict")

    def _class_weight_for(self, task_name: str):
        """(w_negative, w_positive) for a binary task, from compile's
        ``class_weight`` — Keras ``fit(class_weight={0: w0, 1: w1})`` parity
        (flat dict = every binary task; nested dict = per task name)."""
        cw = getattr(self, "_class_weight", None)
        if not cw:
            return None
        if all(isinstance(k, (int, np.integer)) for k in cw):
            # flat dict applies to BINARY tasks only (regression/multiclass
            # targets must not be class-reweighted by 0/1 thresholding)
            from ..outputs.base import BinaryOutput

            binary = {
                h.block_name for h in self.heads() if isinstance(h, BinaryOutput)
            }
            if task_name not in binary:
                return None
            return float(cw.get(0, 1.0)), float(cw.get(1, 1.0))
        task_cw = cw.get(task_name) or cw.get(task_name.split("/")[0])
        if task_cw is None:
            return None
        return float(task_cw.get(0, 1.0)), float(task_cw.get(1, 1.0))

    def _collect_reg_loss(self) -> jnp.ndarray:
        total = jnp.zeros(())
        for b in iter_blocks(self):
            fn = getattr(b, "regularization_loss", None)
            if fn is not None and b is not self:
                total = total + fn()
        return total

    def _loss_weight_for(self, name: str) -> float:
        """Loss weight for a task: compile(loss_weights=...) first (exact head
        name, then bare target name), falling back to weights declared on a
        ``ParallelPredictionBlock`` (V1 ``task_weight_dict``, reference
        ``tf/prediction_tasks/base.py:314``)."""
        lw = self._loss_weights
        if name in lw:
            return lw[name]
        base = name.split("/")[0]
        if base in lw:
            return lw[base]
        for b in iter_blocks(self):
            d = getattr(b, "task_weight_dict", None)
            if isinstance(d, dict) and d:
                if name in d:
                    return d[name]
                if base in d:
                    return d[base]
        return 1.0

    def _compute_losses(self, pred_dict, x, loss_fns):
        row_valid = x.get(ROW_VALID_KEY)
        logs: Dict[str, jnp.ndarray] = {}
        total = jnp.zeros(())
        for name, pred in pred_dict.items():
            if pred.precomputed_loss is not None:
                # fused-loss head: weights/row-validity already folded in
                weight = self._loss_weight_for(name)
                logs[f"loss/{name}"] = pred.precomputed_loss
                total = total + weight * pred.precomputed_loss
                continue
            if pred.targets is None or name not in loss_fns:
                continue
            t, sw = _unwrap_targets(pred)
            sw = _merge_row_valid(sw, row_valid, pred.outputs.shape[0])
            cw = self._class_weight_for(name)
            if cw is not None:
                w0, w1 = cw
                csw = jnp.where(t > 0, w1, w0).astype(jnp.float32)
                if csw.ndim == 2 and csw.shape[-1] == 1:
                    csw = csw[:, 0]
                sw = csw if sw is None else sw * csw.reshape(sw.shape)
            value = _auto_loss(loss_fns[name], t, pred.outputs, sw)
            weight = self._loss_weight_for(name)
            logs[f"loss/{name}"] = value
            total = total + weight * value
        reg = self._collect_reg_loss()
        total = total + reg
        logs["regularization_loss"] = reg
        logs["loss"] = total
        return total, logs

    def _init_metric_states(self, task_metrics):
        return {
            name: [m.init_state() for m in ms] for name, ms in task_metrics.items()
        }

    def _update_metrics(self, states, pred_dict, x, task_metrics):
        row_valid = x.get(ROW_VALID_KEY)
        new_states = {}
        for name, ms in task_metrics.items():
            pred = pred_dict.get(name)
            if pred is None or pred.targets is None:
                new_states[name] = states[name]
                continue
            t, sw = _unwrap_targets(pred)
            outputs = pred.outputs
            sw = _merge_row_valid(sw, row_valid, outputs.shape[0])
            # (B, 1+N) per-candidate weights (ContrastiveSampleWeight) reduce
            # to the positive column for rowwise metrics
            if (
                sw is not None
                and sw.ndim == 2
                and sw.shape[1] > 1
                and outputs.ndim == 2
                and sw.shape == outputs.shape
            ):
                sw = sw[:, 0]
            # flatten sequence logits for metrics: (B, L, C) -> (B*L, C)
            if outputs.ndim == 3:
                C = outputs.shape[-1]
                outputs = outputs.reshape(-1, C)
                if t is not None and t.ndim >= 2:
                    t = t.reshape(-1) if t.ndim == 2 else t.reshape(-1, t.shape[-1])
                if sw is not None:
                    sw = sw.reshape(-1)
            updated = []
            for m, s in zip(ms, states[name]):
                if isinstance(m, (TopKMetric, TopKMetricsAggregator)):
                    tt = t
                    if tt is not None and tt.ndim == outputs.ndim - 1:
                        # sparse ids -> one-hot relevance for top-k metrics
                        tt = jax.nn.one_hot(tt, outputs.shape[-1])
                    updated.append(
                        m.update(
                            s,
                            outputs,
                            tt,
                            sample_weight=sw,
                            label_relevant_counts=pred.label_relevant_counts,
                        )
                    )
                else:
                    updated.append(m.update(s, outputs, t, sample_weight=sw))
            new_states[name] = updated
        return new_states

    def _metric_results(self, states, task_metrics, fetch: bool = True) -> Dict[str, Any]:
        """Metric results — fetched in ONE host transfer (a float() per metric
        costs one tunnel RTT each, ~40ms; batching is the difference between
        epoch overhead and epoch noise). ``fetch=False`` returns device scalars
        so the caller can merge them into a larger single transfer."""
        multi = len(task_metrics) > 1
        out: Dict[str, Any] = {}
        for name, ms in task_metrics.items():
            for m, s in zip(ms, states[name]):
                res = m.result(s)
                # reported_name carries the top-k clamp (ndcg_at_10 over 8
                # candidates logs as ndcg_at_10_clamped_at_8 — VERDICT r3 #10)
                mname = getattr(m, "reported_name", m.name)
                if isinstance(res, dict):
                    for k, v in res.items():
                        out[f"{name}/{k}" if multi else k] = v
                else:
                    out[f"{name}/{mname}" if multi and "/" not in mname else mname] = res
        return _fetch_scalars(out) if fetch else out

    def _split(self):
        return nnx.split(self, nnx.Param, ...)

    def _state_update_paths(self, rest):
        """Map stateful-block keys (e.g. cross-batch FIFO queues) to their flat
        paths inside the non-param state, by array identity. Enables functional
        in-step state updates: blocks write new arrays into
        ``context["state_updates"]`` during the (grad-traced) forward, and the
        train body writes them into the step's output state here — NNX forbids
        Variable mutation under the grad trace."""
        # keys were made unique at build() time (_rekey_stateful_blocks),
        # before the graphdef snapshot the merged modules are rebuilt from
        targets = {}
        for b in iter_blocks(self):
            fn = getattr(b, "state_update_targets", None)
            key = getattr(b, "_state_key", None)
            if fn is None or key is None:
                continue
            fields = fn()
            if any(v is None for v in fields.values()):
                continue  # constructed but never built (lazy slots still None)
            targets[key] = {f: v.value for f, v in fields.items()}
        if not targets:
            return {}
        paths = {}
        for path, leaf in rest.flat_state():
            val = getattr(leaf, "value", None)
            for key, fields in targets.items():
                for field, arr in fields.items():
                    if val is arr:
                        paths.setdefault(key, {})[field] = tuple(path)
        return paths

    @staticmethod
    def _apply_state_updates(new_rest, state_paths, state_updates):
        if not state_updates:
            return new_rest
        for key, fields in state_updates.items():
            for field, arr in fields.items():
                path = state_paths.get(key, {}).get(field)
                if path is None:
                    continue
                node = new_rest
                for part in path[:-1]:
                    node = node[part]
                node[path[-1]].value = arr
        return new_rest

    def _train_body(self, loss_fns, task_metrics, with_metrics: bool, mesh=None):
        """One un-jitted training step: the body shared by the single-step and
        multi-step (steps_per_execution scan) compiled variants."""
        graphdef = self._graphdef
        _, _, rest0 = nnx.split(self, nnx.Param, ...)
        state_paths = self._state_update_paths(rest0)

        def body(params, rest, opt_state, metric_states, x, y, step):
            def loss_fn(p):
                model = nnx.merge(graphdef, p, rest)
                context = ModelContext(features=x, targets=y, step=step)
                context["need_logits"] = with_metrics
                if mesh is not None:
                    context["mesh"] = mesh
                preds = call_block(model, x, targets=y, training=True, context=context)
                pred_dict = model._as_pred_dict(preds)
                total, logs = model._compute_losses(pred_dict, x, loss_fns)
                _, _, new_rest = nnx.split(model, nnx.Param, ...)
                return total, (logs, new_rest, pred_dict, model, context.get("state_updates"))

            (loss_val, (logs, new_rest, pred_dict, model_out, state_updates)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(params)
            )
            new_rest = self._apply_state_updates(new_rest, state_paths, state_updates)
            updates, opt_state = self._tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if with_metrics:
                metric_states = model_out._update_metrics(
                    metric_states, pred_dict, x, task_metrics
                )
            return params, new_rest, opt_state, metric_states, logs

        return body

    def _make_train_step(self, loss_fns, task_metrics, with_metrics: bool, mesh=None):
        step_fn = self._train_body(loss_fns, task_metrics, with_metrics, mesh)
        if self._jit:
            step_fn = jax.jit(step_fn, donate_argnums=(0, 1, 2, 3))
        return step_fn

    @staticmethod
    def _pack_device_columns(feats_h, targs_h, n_rows: int):
        """Pack every (feature + target) column into ONE (n, F) int32 matrix
        (f32 bitcast, bool widened) + a static unpack spec. The chunk step
        then slices ONE array per batch instead of ~15 — each tiny
        dynamic-slice inside the scan carries a fixed op cost that measured
        ~1.2ms/step of pure overhead on this TPU."""
        leaves, treedef = jax.tree_util.tree_flatten((feats_h, targs_h))
        spec = []
        cols = []
        off = 0
        for leaf in leaves:
            a = np.asarray(leaf)
            tail = a.shape[1:]
            w = int(np.prod(tail)) if tail else 1
            flat = np.ascontiguousarray(a.reshape(n_rows, w))
            if flat.dtype == np.bool_:
                kind, flat = "bool", flat.astype(np.int32)
            elif flat.dtype.kind == "f":
                kind, flat = "f32", flat.astype(np.float32).view(np.int32)
            else:
                kind, flat = "i32", flat.astype(np.int32)
            spec.append((kind, off, w, tail))
            cols.append(flat)
            off += w
        packed = np.concatenate(cols, axis=1) if cols else np.zeros((n_rows, 0), np.int32)
        return packed, tuple(spec), treedef

    @staticmethod
    def _make_unpack(spec, treedef):
        """Inverse of ``_pack_device_columns`` for one (B, F) slice — the ONE
        decoder for the packed layout (used by the chunk, fused-epochs, and
        device-eval scans; a format change must not be able to drift)."""

        def unpack(sl):
            leaves = []
            for kind, off, w, tail in spec:
                part = jax.lax.slice_in_dim(sl, off, off + w, axis=1)
                if kind == "f32":
                    part = jax.lax.bitcast_convert_type(part, jnp.float32)
                elif kind == "bool":
                    part = part != 0
                leaves.append(part.reshape((sl.shape[0],) + tail))
            return jax.tree_util.tree_unflatten(treedef, leaves)

        return unpack

    def _traced_pre(self):
        """The fit ``pre=`` transform when it can be traced INTO the fused
        device-resident scans: sequence transforms are pure jnp (static
        shapes, explicit masks), so predict-next/mask-random shifting runs
        compiled on device instead of forcing the streaming path. Anything
        else returns None (streaming fallback applies it per batch)."""
        from ..transforms.sequence import SequenceTransform

        pre = getattr(self, "_pre_transform", None)
        return pre if isinstance(pre, SequenceTransform) else None

    def _apply_traced_pre(self, pre, x, y, step):
        """Mirror of ``_apply_pre``'s eager() body, for use inside a trace."""
        context = ModelContext(features=x, targets=y, step=step)
        out = call_block(pre, x, targets=y, training=True, context=context)
        if isinstance(out, tuple):
            return out
        return out, context.targets if context.targets is not None else y

    def _make_device_chunk_step(self, loss_fns, task_metrics, with_metrics,
                                k: int, batch_size: int, spec, treedef):
        """k training steps in one executable over DEVICE-RESIDENT data: the
        full dataset's columns live in HBM as one packed matrix (uploaded once
        by fit) and each step bitcast-unpacks a contiguous slice — zero
        host→device traffic per step and ONE slice op per batch. This is the
        TPU answer to the reference dataloader's GPU-resident chunk strategy
        (merlin-dataloader), and the difference between tunnel-bandwidth-bound
        and compute-bound training."""
        body = self._train_body(loss_fns, task_metrics, with_metrics, mesh=None)
        unpack = self._make_unpack(spec, treedef)
        pre = self._traced_pre()

        def chunk_fn(params, rest, opt_state, metric_states, packed, perm, step0, local0):
            # permute the chunk's rows ONCE (one HBM-bound gather of the
            # packed matrix), then every step slices contiguously
            chunk_idx = jax.lax.dynamic_slice_in_dim(
                perm, local0 * batch_size, k * batch_size
            )
            packed_p = jnp.take(packed, chunk_idx, axis=0)

            def scan_body(carry, i):
                p, r, o, m = carry
                sl = jax.lax.dynamic_slice_in_dim(packed_p, i * batch_size, batch_size)
                # no ROW_VALID: fit() packs with drop_last=True, so every row is
                # valid — omitting the key keeps losses/metrics on the unweighted
                # fast path instead of weighted-mean with an all-ones mask
                x, y = unpack(sl)
                if pre is not None:
                    x, y = self._apply_traced_pre(pre, x, y, step0 + i)
                p, r, o, m, logs = body(p, r, o, m, x, y, step0 + i)
                return (p, r, o, m), logs

            (params, rest, opt_state, metric_states), logs = jax.lax.scan(
                scan_body,
                (params, rest, opt_state, metric_states),
                jnp.arange(k),
            )
            return params, rest, opt_state, metric_states, logs

        if self._jit:
            chunk_fn = jax.jit(chunk_fn, donate_argnums=(0, 1, 2, 3))
        return chunk_fn

    def _make_device_epochs_step(self, loss_fns, task_metrics, k: int,
                                 batch_size: int, spec, treedef,
                                 epochs_static: Optional[int] = None,
                                 val_scan=None):
        """ALL epochs in ONE executable over device-resident data: outer
        ``lax.scan`` over per-epoch permutations, inner scan over the epoch's
        ``k`` steps, with the epoch-log reduction (loss means + metric
        results) computed in-trace. The whole fit() becomes one dispatch and
        ONE scalar transfer — the last per-epoch fixed costs (26-78ms
        dispatch + ~40ms epoch-log RTT through the tunnel) disappear.
        Reference counterpart: the Keras epoch loop (tf/models/base.py:1361)
        pays these per epoch by construction."""
        # with no compiled metrics, trace the metric-free body: need_logits=True
        # would force heads to materialize full logits (the (B,1+N) contrastive
        # matrix) that nothing consumes, defeating the fused flash-CE path
        with_metrics = any(task_metrics.values())
        body = self._train_body(loss_fns, task_metrics, with_metrics, mesh=None)
        unpack = self._make_unpack(spec, treedef)
        pre = self._traced_pre()

        names_out: list = []  # populated at trace time (sorted epoch-log keys)

        def epochs_fn(params, rest, opt_state, packed, perms, step0,
                      val_packed=None):
            def epoch_body(carry, perm):
                p, r, o, s0 = carry
                metric_states = self._init_metric_states(task_metrics)
                if perm is None:
                    # shuffle=False: read batches straight out of the packed
                    # matrix — no permutation upload, no whole-epoch gather
                    packed_p = packed
                else:
                    chunk_idx = jax.lax.slice_in_dim(perm, 0, k * batch_size)
                    packed_p = jnp.take(packed, chunk_idx, axis=0)

                def scan_body(inner, i):
                    p, r, o, m = inner
                    sl = jax.lax.dynamic_slice_in_dim(
                        packed_p, i * batch_size, batch_size
                    )
                    # all rows valid (drop_last=True pack) — see chunk_fn note
                    x, y = unpack(sl)
                    if pre is not None:
                        x, y = self._apply_traced_pre(pre, x, y, s0 + i)
                    p, r, o, m, logs = body(p, r, o, m, x, y, s0 + i)
                    return (p, r, o, m), logs

                (p, r, o, m), logs = jax.lax.scan(
                    scan_body, (p, r, o, metric_states), jnp.arange(k)
                )
                vals = {key: jnp.mean(v) for key, v in logs.items()}
                vals.update(self._metric_results(m, task_metrics, fetch=False))
                if val_scan is not None:
                    # in-dispatch validation: the whole eval set scans on
                    # device right after the epoch's training steps
                    vm, vacc = val_scan(p, r, val_packed)
                    vals["val_loss"] = vacc["total"] / jnp.maximum(
                        vacc["count"], 1.0
                    )
                    vals.update({
                        f"val_{key}": v
                        for key, v in self._metric_results(
                            vm, task_metrics, fetch=False
                        ).items()
                    })
                vals = {
                    key: jnp.asarray(v, jnp.float32).reshape(())
                    for key, v in vals.items()
                }
                return (p, r, o, s0 + k), vals

            if perms is None:
                def no_perm_body(carry, _):
                    return epoch_body(carry, None)

                (params, rest, opt_state, _), epoch_vals = jax.lax.scan(
                    no_perm_body, (params, rest, opt_state, step0), None,
                    length=epochs_static,
                )
            else:
                (params, rest, opt_state, _), epoch_vals = jax.lax.scan(
                    epoch_body, (params, rest, opt_state, step0), perms
                )
            names_out[:] = sorted(epoch_vals)
            stacked = jnp.stack([epoch_vals[n] for n in names_out])  # (n_names, E)
            return params, rest, opt_state, stacked

        if self._jit:
            epochs_fn = jax.jit(epochs_fn, donate_argnums=(0, 1, 2))
        return epochs_fn, names_out

    def _make_multi_train_step(self, loss_fns, task_metrics, with_metrics, mesh, k: int):
        """k training steps in ONE executable (Keras ``steps_per_execution``):
        batches arrive stacked on a leading (k, ...) axis and a ``lax.scan``
        consumes them — per-step dispatch/RTT overhead is paid once per k steps
        (decisive through the TPU tunnel; also trims host overhead on pods)."""
        body = self._train_body(loss_fns, task_metrics, with_metrics, mesh)

        def step_fn(params, rest, opt_state, metric_states, xs, ys, step0):
            def scan_body(carry, inp):
                p, r, o, m = carry
                x, y, i = inp
                p, r, o, m, logs = body(p, r, o, m, x, y, step0 + i)
                return (p, r, o, m), logs

            (params, rest, opt_state, metric_states), logs = jax.lax.scan(
                scan_body,
                (params, rest, opt_state, metric_states),
                (xs, ys, jnp.arange(k)),
            )
            return params, rest, opt_state, metric_states, logs

        if self._jit:
            step_fn = jax.jit(step_fn, donate_argnums=(0, 1, 2, 3))
        return step_fn

    # ------------------------------------------------------------------
    # row-sparse embedding training (blocks/optimizer.py)
    # ------------------------------------------------------------------
    def _embedding_tables(self):
        from ..inputs.embedding import EmbeddingTable

        return [
            b for b in iter_blocks(self) if isinstance(b, EmbeddingTable) and b.trainable
        ]

    def _sparse_routed_tables(self):
        """(sparse, dense) table partition under ``compile(sparse_threshold=)``.

        No threshold → everything sparse (the pre-round-4 behavior). With a
        threshold, tables at or below it ride the dense optax transform —
        except low-precision tables, whose stochastic-rounding updates only
        exist on the scatter path."""
        tables = self._embedding_tables()
        thr = getattr(self, "_sparse_threshold", None)
        if thr is None:
            return tables, []
        routed, dense = [], []
        for t in tables:
            lowp = t.table.value.dtype != jnp.float32
            (routed if (lowp or t.input_dim > thr) else dense).append(t)
        return routed, dense

    def _apply_sparse_routing(self):
        """Stamp the routing decision on the params (``sparse_route`` variable
        metadata) so :meth:`_sparse_param_filter` can split routed tables away
        from the dense optimizer. Idempotent; must run before any split that
        uses the filter (fit does; ``arm_training_state`` on a built model)."""
        routed, dense = self._sparse_routed_tables()
        for t in routed:
            t.table.set_metadata(sparse_route=True)
        for t in dense:
            t.table.set_metadata(sparse_route=False)
            t._tap_key = None
        return routed, dense

    def _sparse_param_filter(self):
        """nnx filter for the params the SPARSE embedding optimizer owns.
        Without threshold routing this is the EmbeddingParam class itself;
        with routing, the predicate honors the stamped metadata."""
        emb_type = _embedding_param_type()
        if getattr(self, "_sparse_threshold", None) is None:
            return emb_type
        return lambda path, x: isinstance(x, emb_type) and bool(
            getattr(x, "sparse_route", True)
        )

    def _setup_sparse_embeddings(self, loader, sparse):
        """Assign tap keys, create optimizer slots, and discover tap shapes by one
        eager training-mode forward."""
        routed, dense_routed = self._apply_sparse_routing()
        for i, t in enumerate(routed):
            t._tap_key = f"t{i}"
            if t.sparse_slots is None or not len(t.sparse_slots):
                sparse.init_slots(t)
        x, y = loader.peek()
        if getattr(self, "_pre_transform", None) is not None:
            x, y = self._apply_pre(x, y, training=True, step=0)
        x = to_device_batch(x)
        shapes: Dict[str, tuple] = {}
        context = ModelContext(features=x, targets=y, step=0)
        context["collect_tap_shapes"] = shapes
        call_block(self, x, targets=y, training=True, context=context)
        if not shapes and not dense_routed:
            raise ValueError(
                "embedding_optimizer was set but no embedding lookups were traced; "
                "check that the model has trainable EmbeddingTables"
            )
        if not shapes:
            import warnings

            warnings.warn(
                f"sparse_threshold={self._sparse_threshold} routed every "
                "embedding table to the dense optimizer — the sparse step "
                "runs with no scatter work; drop embedding_optimizer or "
                "lower the threshold",
                stacklevel=2,
            )
        return shapes

    def _make_sparse_train_step(
        self, loss_fns, task_metrics, tap_shapes, sparse, with_metrics, mesh=None
    ):
        graphdef = self._graphdef
        emb_type = self._sparse_param_filter()
        _, _, _, rest0 = nnx.split(self, emb_type, nnx.Param, ...)
        state_paths = self._state_update_paths(rest0)

        def step_fn(dense_params, emb_params, rest, opt_state, metric_states, x, y, step):
            taps = {k: jnp.zeros(s) for k, s in tap_shapes.items()}

            def loss_fn(dp, taps):
                model = nnx.merge(graphdef, emb_params, dp, rest)
                context = ModelContext(features=x, targets=y, step=step)
                context["need_logits"] = with_metrics
                if mesh is not None:
                    context["mesh"] = mesh
                context["taps"] = taps
                context["tap_ids"] = {}
                preds = call_block(model, x, targets=y, training=True, context=context)
                pred_dict = model._as_pred_dict(preds)
                total, logs = model._compute_losses(pred_dict, x, loss_fns)
                _, _, _, new_rest = nnx.split(model, emb_type, nnx.Param, ...)
                return total, (
                    logs, context["tap_ids"], pred_dict, new_rest,
                    context.get("state_updates"),
                )

            (loss_val, (logs, tap_ids, pred_dict, new_rest, state_updates)), (gd, gt) = (
                jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(dense_params, taps)
            )
            new_rest = self._apply_state_updates(new_rest, state_paths, state_updates)
            updates, opt_state = self._tx.update(gd, opt_state, dense_params)
            dense_params = optax.apply_updates(dense_params, updates)

            # scatter-update the tables (and slots) at the looked-up rows
            model = nnx.merge(graphdef, emb_params, dense_params, new_rest)
            for table in model._embedding_tables():
                if table._tap_key is None:  # dense-routed under sparse_threshold
                    continue
                prefix = table._tap_key + ":"
                for key, ids in tap_ids.items():
                    if key.startswith(prefix):
                        sparse.apply(table, ids, gt[key], step, mesh=mesh)
            if with_metrics:
                metric_states = model._update_metrics(metric_states, pred_dict, x, task_metrics)
            _, new_emb, new_dense, new_rest2 = nnx.split(model, emb_type, nnx.Param, ...)
            return new_dense, new_emb, new_rest2, opt_state, metric_states, logs

        if self._jit:
            step_fn = jax.jit(step_fn, donate_argnums=(0, 1, 2, 3, 4))
        return step_fn

    def _eval_body(self, loss_fns, task_metrics, mesh=None):
        """One un-jitted eval step: shared by the per-batch jitted step and
        the device-resident fused evaluate."""
        graphdef = self._graphdef

        def body(params, rest, metric_states, loss_acc, x, y):
            model = nnx.merge(graphdef, params, rest)
            context = ModelContext(features=x, targets=y, testing=True)
            context["need_logits"] = True
            if mesh is not None:
                context["mesh"] = mesh
            preds = call_block(model, x, targets=y, training=False, context=context)
            pred_dict = model._as_pred_dict(preds)
            total, logs = model._compute_losses(pred_dict, x, loss_fns)
            metric_states = model._update_metrics(metric_states, pred_dict, x, task_metrics)
            loss_acc = {
                "total": loss_acc["total"] + total,
                "count": loss_acc["count"] + 1.0,
            }
            return metric_states, loss_acc

        return body

    def _make_eval_step(self, loss_fns, task_metrics, mesh=None):
        # reuse the jitted step across epochs/calls (same graph structure):
        # re-jitting every evaluate() would retrace per validation epoch.
        # The graphdef that validated the entry is stored PER ENTRY — a single
        # shared sentinel let one cache site refresh it and thereby "validate"
        # another site's stale closure over the old graphdef.
        cache_key = ("eval", mesh)
        cached = self._step_cache.get(cache_key)
        if cached is not None and cached[1] == self._graphdef:
            return cached[0]
        step_fn = self._eval_body(loss_fns, task_metrics, mesh)
        if self._jit:
            step_fn = jax.jit(step_fn, donate_argnums=(2, 3))
        self._step_cache[cache_key] = (step_fn, self._graphdef)
        return step_fn

    def _device_eval_scan(self, loss_fns, task_metrics, batch_size: int,
                          n_rows: int, spec, treedef):
        """Un-jitted full-dataset eval over a device-resident packed matrix
        (padded to a whole number of batches): scan over batches with the
        final partial batch masked via ROW_VALID, returning metric states and
        the loss accumulator. Used by fused evaluate() and by the in-dispatch
        validation pass of the fused fit."""
        body = self._eval_body(loss_fns, task_metrics, mesh=None)
        n_batches = (n_rows + batch_size - 1) // batch_size
        unpack = self._make_unpack(spec, treedef)

        def eval_scan(params, rest, packed):
            metric_states = self._init_metric_states(task_metrics)
            loss_acc = {"total": jnp.zeros(()), "count": jnp.zeros(())}

            def scan_body(carry, i):
                m, acc = carry
                sl = jax.lax.dynamic_slice_in_dim(packed, i * batch_size, batch_size)
                x, y = unpack(sl)
                x[ROW_VALID_KEY] = (i * batch_size + jnp.arange(batch_size)) < n_rows
                m, acc = body(params, rest, m, acc, x, y)
                return (m, acc), None

            (metric_states, loss_acc), _ = jax.lax.scan(
                scan_body, (metric_states, loss_acc), jnp.arange(n_batches)
            )
            return metric_states, loss_acc

        return eval_scan

    def _make_predict_step(self):
        graphdef = self._graphdef

        def step_fn(params, rest, x):
            model = nnx.merge(graphdef, params, rest)
            context = ModelContext(features=x)
            preds = call_block(model, x, targets=None, training=False, context=context)
            if isinstance(preds, Prediction):
                heads = model.heads()
                act = heads[0].activation if heads else (lambda v: v)
                return act(preds.outputs)
            if isinstance(preds, TopKPrediction):
                return {"scores": preds.scores, "ids": preds.identifiers}
            if isinstance(preds, dict):
                out = {}
                head_by_name = {h.block_name: h for h in model.heads()}
                for k, v in preds.items():
                    if isinstance(v, Prediction):
                        head = head_by_name.get(k)
                        out[k] = head.activation(v.outputs) if head else v.outputs
                    else:
                        out[k] = v
                return out
            return preds

        if self._jit:
            step_fn = jax.jit(step_fn)
        return step_fn

    # ------------------------------------------------------------------
    # fit / evaluate / predict
    # ------------------------------------------------------------------
    def _as_loader(self, data, batch_size, shuffle=False, drop_last=None) -> Loader:
        if isinstance(data, Loader):
            return data
        if isinstance(data, (Dataset, str)):
            return Loader(data, batch_size=batch_size or 1024, shuffle=shuffle, drop_last=drop_last)
        raise TypeError(f"Cannot iterate {type(data)}")

    # ------------------------------------------------------------------
    # optimizer-state continuity across fit() calls
    # ------------------------------------------------------------------
    @property
    def _fit_opt_state(self):
        """Persisted optimizer slots from the last fit(), or None. Held in a
        weak side table (not an nnx attribute: the module pytree must not
        carry optimizer arrays through the train step's ``rest`` state)."""
        entry = _FIT_STATE.get(self)
        return entry[0] if entry else None

    @staticmethod
    def _mesh_fingerprint(mesh):
        if mesh is None:
            return None
        return (
            tuple(mesh.shape.items()),
            tuple(d.id for d in mesh.devices.flat),
        )

    @staticmethod
    def _param_fingerprint(params):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        return (treedef, tuple((tuple(l.shape), str(l.dtype)) for l in leaves))

    def _resume_fit_state(self, params, mesh):
        """A second fit() continues the first fit's optimizer slots and step
        count — reference semantics: Keras optimizer variables live on the
        model, so consecutive merlin ``fit()`` calls accumulate Adam moments
        and iteration counts (`/root/reference/merlin/models/tf/models/base.py:1361`);
        ``compile()`` resets them. Reuse is conservative: same transform
        object, identical param tree/shapes/dtypes, same mesh placement —
        anything else re-initializes (so MultiOptimizer/frozen-block fits,
        which rebuild the transform per fit, always start fresh)."""
        # pop = take ownership: the train step donates the buffers
        entry = _FIT_STATE.pop(self, None)
        if entry is None:
            return None, 0
        state, tx_ref, fp, mesh_fp, step = entry
        if (
            tx_ref is not self._tx
            or mesh_fp != self._mesh_fingerprint(mesh)
            or fp != self._param_fingerprint(params)
        ):
            return None, 0
        # epoch-end stores hold LIVE references; if a later epoch crashed
        # mid-run its steps already donated these buffers — start fresh
        if any(
            getattr(x, "is_deleted", lambda: False)()
            for x in jax.tree_util.tree_leaves(state)
        ):
            return None, 0
        return state, step

    def training_state(self):
        """The persisted optimizer slots + global step from the last completed
        fit() epoch, or None. What `ModelCheckpoint` snapshots so a preempted
        run resumes with intact Adam moments (see
        ``CheckpointManager.restore_training``)."""
        entry = _FIT_STATE.get(self)
        if entry is None:
            return None
        state = entry[0]
        # a mid-epoch crash leaves the epoch-end snapshot's buffers donated by
        # the next epoch's steps — never hand out deleted arrays
        if any(
            getattr(x, "is_deleted", lambda: False)()
            for x in jax.tree_util.tree_leaves(state)
        ):
            return None
        return {"opt_state": state, "global_step": entry[4]}

    def _dense_params(self):
        """The dense-param State the optimizer transform runs over — excludes
        embedding tables when a sparse embedding optimizer owns them (the same
        split fit() makes)."""
        if getattr(self, "_emb_opt", None) is not None:
            self._apply_sparse_routing()
            _, _, params, _ = nnx.split(
                self, self._sparse_param_filter(), nnx.Param, ...
            )
            return params
        _, params, _ = self._split()
        return params

    def arm_training_state(self, opt_state, global_step: int = 0, mesh=None):
        """Install restored optimizer slots so the NEXT fit() continues from
        them (checkpoint-resume). The model must be built and compiled with
        the same optimizer config the slots came from."""
        self._store_fit_state(opt_state, self._dense_params(), mesh, int(global_step))

    def _store_fit_state(self, opt_state, params, mesh, global_step):
        _FIT_STATE[self] = (
            opt_state,
            self._tx,
            self._param_fingerprint(params),
            self._mesh_fingerprint(mesh),
            int(global_step),
        )

    def fit(
        self,
        data: Union[Dataset, Loader, str],
        epochs: int = 1,
        batch_size: Optional[int] = None,
        shuffle: bool = True,
        validation_data: Union[None, Dataset, Loader] = None,
        steps_per_epoch: Optional[int] = None,
        callbacks: Optional[Sequence] = None,
        pre=None,
        verbose: int = 1,
        mesh=None,
        shard_rules=None,
        validation_freq: int = 1,
        initial_epoch: int = 0,
        validation_steps: Optional[int] = None,
    ) -> History:
        if not self._compiled:
            self.compile()
        if not 0 <= initial_epoch < max(epochs, 1):
            raise ValueError(
                f"initial_epoch={initial_epoch} must be in [0, epochs={epochs})"
            )
        n_run_epochs = epochs - initial_epoch
        loader = self._as_loader(data, batch_size, shuffle=shuffle, drop_last=True)
        self.build(loader)
        # Keras resets this at every fit() start; a stale True from a previous
        # EarlyStopping/TerminateOnNaN stop would silently truncate this run
        self.stop_training = False
        self._pre_transform = as_block(pre) if pre is not None else nnx.data(None)

        sparse = getattr(self, "_emb_opt", None)
        if sparse is None:
            lowp = [
                t
                for t in self._embedding_tables()
                if t.trainable and t.table.value.dtype != jnp.float32
            ]
            if lowp:
                raise ValueError(
                    "Low-precision embedding tables "
                    f"({[t.block_name for t in lowp]}) train via stochastic-"
                    "rounding scatter updates — compile() with a sparse "
                    'embedding_optimizer (e.g. embedding_optimizer="adagrad"); '
                    "the dense optimizer would round-to-nearest in bf16 and "
                    "silently drop small updates"
                )
        tap_shapes = None
        if sparse is not None:
            tap_shapes = self._setup_sparse_embeddings(loader, sparse)
            graphdef, emb_params, params, rest = nnx.split(
                self, self._sparse_param_filter(), nnx.Param, ...
            )
        else:
            emb_params = None
            graphdef, params, rest = self._split()
        from ..blocks.optimizer import MultiOptimizer

        # derive the EFFECTIVE transform for this fit from the compiled one —
        # never mutate the compiled transform in place: a frozen-block fit
        # must not leave its zero-update rules behind after unfreeze, and
        # repeated frozen fits must not nest wrappers. With no frozen blocks
        # and a plain transform this is the identical object every fit, which
        # is what lets optimizer-state continuity (`_resume_fit_state`'s
        # `tx_ref is self._tx` check) carry slots across fit() calls.
        tx = getattr(self, "_base_tx", self._tx)
        if isinstance(tx, MultiOptimizer):
            tx = tx.build(params)
        frozen = self.frozen_blocks()
        if frozen:
            # frozen blocks get zero updates (reference freeze_blocks semantics)
            tx = MultiOptimizer(
                default=tx, rules=[(b, optax.set_to_zero()) for b in frozen]
            ).build(params)
        self._tx = tx
        if mesh is not None:
            from ..parallel.mesh import shard_state

            params = shard_state(params, mesh, shard_rules)
            # rest rides the same rules: sparse-optimizer slots co-shard with
            # their tables (everything unmatched stays replicated)
            rest = shard_state(rest, mesh, shard_rules)
            if emb_params is not None:
                emb_params = shard_state(emb_params, mesh, shard_rules)
        self._graphdef = graphdef
        loss_fns = self._resolve_task_losses()
        task_metrics = self._resolve_task_metrics()
        # with NO compiled metrics, metric steps are indistinguishable from
        # fast steps — and tracing with_metrics=True anyway forces heads to
        # materialize logits nothing consumes (need_logits=True), which for
        # flattened-sequence contrastive training is the full (B*L, B*L)
        # matrix: 17 GB at bucket-64, an OOM for a no-op (r5)
        has_metrics = any(task_metrics.values())
        self._mesh = mesh
        if sparse is not None:
            train_step = self._make_sparse_train_step(
                loss_fns, task_metrics, tap_shapes, sparse,
                with_metrics=has_metrics, mesh=mesh,
            )
            train_step_fast = (
                train_step
                if self.train_metrics_steps == 1
                else self._make_sparse_train_step(
                    loss_fns, task_metrics, tap_shapes, sparse, with_metrics=False, mesh=mesh
                )
            )
        else:
            train_step = self._make_train_step(
                loss_fns, task_metrics, with_metrics=has_metrics, mesh=mesh
            )
            train_step_fast = (
                train_step
                if self.train_metrics_steps == 1
                else self._make_train_step(loss_fns, task_metrics, with_metrics=False, mesh=mesh)
            )
        # steps_per_execution: k batches per dispatch (single-device dense path)
        spe = self._steps_per_execution if (sparse is None and mesh is None) else 1
        bucketed = getattr(loader, "pad", "max") == "bucket"
        # pad="bucket" + fast paths (VERDICT r3 #4): group rows by sequence
        # bucket and go device-resident PER GROUP — uniform shapes within a
        # group give the fused multi-step scan a handful of compiled variants
        # (the log2 length spread) instead of one host dispatch per batch
        device_groups = None
        if bucketed and spe > 1:
            if (
                (self._pre_transform is None or self._traced_pre() is not None)
                and loader.transform is None
                and loader.global_size == 1
                and loader.drop_last
            ):
                try:
                    raw_groups = loader.bucketed_dense_columns()
                except ValueError:
                    raw_groups = None
                if raw_groups:
                    # drop_last applies PER GROUP here: if the length
                    # distribution shreds the data into groups that can't
                    # fill batches, keep the streaming path (which drops at
                    # most one partial batch per epoch) instead of silently
                    # training on a fraction of the data
                    total_rows = sum(n for _, _, _, n in raw_groups)
                    usable = sum(
                        (n // loader.batch_size) * loader.batch_size
                        for _, _, _, n in raw_groups
                    )
                    if usable < 0.8 * total_rows:
                        raw_groups = None
                if raw_groups:
                    nbytes = sum(
                        a.nbytes
                        for _, f, t, _ in raw_groups
                        for a in jax.tree_util.tree_leaves((f, t))
                        if hasattr(a, "nbytes")
                    )
                    if nbytes <= (2 << 30):
                        device_groups = []
                        for gkey, feats_g, targs_g, n_g in raw_groups:
                            packed_g, spec_g, treedef_g = self._pack_device_columns(
                                feats_g, targs_g, n_g
                            )
                            device_groups.append(
                                (gkey, jnp.asarray(packed_g), spec_g, treedef_g, n_g)
                            )
            if device_groups is None:
                # bucketed host batches have varying sequence lengths: the
                # multi-step scan stacks k batches and needs uniform shapes
                spe = 1
        multi_step = multi_step_fast = None
        if spe > 1 and bucketed:
            multi_step = None  # per-group chunk fns carry the fused path
        elif spe > 1:
            multi_step = self._make_multi_train_step(loss_fns, task_metrics, True, mesh, spe)
            multi_step_fast = (
                multi_step
                if self.train_metrics_steps == 1
                else self._make_multi_train_step(loss_fns, task_metrics, False, mesh, spe)
            )
        # device-resident data: upload the dataset's columns to HBM once and
        # gather batches on device — host→device traffic drops to one upload +
        # one permutation per epoch (merlin-dataloader's GPU-resident strategy)
        device_data = None
        if (
            spe > 1
            and sparse is None
            and mesh is None
            and (self._pre_transform is None or self._traced_pre() is not None)
            and loader.transform is None
            and loader.global_size == 1
            and loader.drop_last
            and getattr(loader, "pad", "max") == "max"  # bucketed shapes vary
        ):
            ds_obj = loader.dataset
            cached_pack = getattr(ds_obj, "_device_train_pack", None)
            if cached_pack is not None:
                # consecutive fit() calls on the same dataset (continuation
                # workflows, warm+measure benches) reuse the uploaded pack —
                # a fresh upload costs up to 2GB over the ~40MB/s tunnel. The
                # pack is batch-size independent (no padding; drop_last only
                # changes how many rows the scan consumes). Never donated.
                n_rows, pack_spec, pack_treedef, packed_dev = cached_pack
                device_data = (packed_dev, n_rows)
            else:
                try:
                    feats_h, targs_h, n_rows = loader.dense_columns()
                except ValueError:
                    feats_h = None
                if feats_h is not None:
                    nbytes = sum(
                        a.nbytes
                        for a in jax.tree_util.tree_leaves((feats_h, targs_h))
                        if hasattr(a, "nbytes")
                    )
                    if nbytes <= (2 << 30):
                        packed_h, pack_spec, pack_treedef = self._pack_device_columns(
                            feats_h, targs_h, n_rows
                        )
                        device_data = (jnp.asarray(packed_h), n_rows)
                        try:
                            ds_obj._device_train_pack = (
                                n_rows, pack_spec, pack_treedef, device_data[0]
                            )
                            # bound pinned HBM like the eval packs: at most two
                            # datasets keep a device-resident training pack
                            _TRAIN_PACK_LRU.append(weakref.ref(ds_obj))
                            while len(_TRAIN_PACK_LRU) > 2:
                                old = _TRAIN_PACK_LRU.popleft()()
                                if old is not None and old is not ds_obj:
                                    old._device_train_pack = None
                        except AttributeError:
                            pass
        chunk_fns: Dict[Any, Any] = {}

        def device_chunk_fn(k: int, with_metrics: bool, spec=None, treedef=None):
            if spec is None:
                spec, treedef = pack_spec, pack_treedef
            key = (k, with_metrics, tuple(spec), str(treedef))
            if key not in chunk_fns:
                chunk_fns[key] = self._make_device_chunk_step(
                    loss_fns, task_metrics, with_metrics, k, loader.batch_size,
                    spec, treedef,
                )
            return chunk_fns[key]

        perms_box: list = []
        if device_data is not None:
            # all epochs' permutations in ONE upload (a per-epoch 1MB transfer
            # costs ~50ms through the tunnel; uploaded lazily — the fused
            # no-shuffle path reads batches in place and never needs them);
            # seeds mirror loader.epoch_seed()
            n_rows_dd = device_data[1]
            base_epoch = loader._epoch
            perms = []
            for e in range(n_run_epochs):
                seed = loader.seed + (base_epoch + 1 + e) * 9973
                rng_e = np.random.default_rng(seed)
                perms.append(
                    rng_e.permutation(n_rows_dd) if loader.shuffle else np.arange(n_rows_dd)
                )
            perms_host = np.stack(perms).astype(np.int32)

            def get_perms_dev():
                if not perms_box:
                    perms_box.append(jnp.asarray(perms_host))
                return perms_box[0]
        group_perm_cache: Dict[Any, Any] = {}
        if device_groups is not None:
            base_epoch_g = loader._epoch

            def get_group_perm(gkey, n_rows_g: int, epoch_i: int):
                # all epochs' permutations per group in one lazy upload;
                # seeds salt the group key so groups don't share an order
                arr = group_perm_cache.get(gkey)
                if arr is None:
                    ps = []
                    for e in range(n_run_epochs):
                        if loader.shuffle:
                            seed = (
                                loader.seed
                                + (base_epoch_g + 1 + e) * 9973
                                + (hash(gkey) & 0xFFFF)
                            )
                            ps.append(np.random.default_rng(seed).permutation(n_rows_g))
                        else:
                            ps.append(np.arange(n_rows_g))
                    arr = group_perm_cache[gkey] = jnp.asarray(
                        np.stack(ps).astype(np.int32)
                    )
                return arr[epoch_i]
        opt_state, resumed_step = self._resume_fit_state(params, mesh)
        if opt_state is None:
            opt_state = self._tx.init(params)
            if mesh is not None:
                from ..parallel.mesh import shard_state

                # optimizer slots inherit each param's placement
                opt_state = shard_state(opt_state, mesh, shard_rules)

        history = History()
        callbacks = list(callbacks or [])
        for cb in callbacks:
            call = getattr(cb, "set_model", None)
            if call:
                call(self)
        global_step = resumed_step
        # full-fit fusion: with device-resident data and no per-epoch host
        # obligations (callbacks, validation), run every epoch in ONE dispatch
        if (
            device_data is not None
            and not callbacks
            and validation_freq == 1
            and validation_steps is None
            and (self.train_metrics_steps == 1 or not any(task_metrics.values()))
        ):
            packed_dev, n_rows = device_data
            n_batches = n_rows // loader.batch_size
            if steps_per_epoch is not None:
                n_batches = min(n_batches, steps_per_epoch)
            # validation joins the dispatch when it can go device-resident
            val_scan = None
            val_packed_dev = None
            val_ok = validation_data is None
            if validation_data is not None:
                val_loader = self._as_loader(
                    validation_data, batch_size or loader.batch_size,
                    shuffle=False, drop_last=False,
                )
                vpack = self._pack_for_eval(val_loader)
                if vpack is not None:
                    val_packed_dev, vn, vspec, vtreedef = vpack
                    val_scan = self._device_eval_scan(
                        loss_fns, task_metrics, val_loader.batch_size,
                        vn, vspec, vtreedef,
                    )
                    val_ok = True
            if n_batches > 0 and val_ok:
                loader._epoch += n_run_epochs
                fused_cache = getattr(self, "_fused_fit_cache", None)
                if fused_cache is None:
                    fused_cache = self._fused_fit_cache = {}
                traced_pre = self._traced_pre()
                fkey = (
                    n_batches, loader.batch_size, loader.shuffle, n_run_epochs,
                    # the traced pre is part of the program; pin it in the
                    # entry so id() stays unique for the cache's lifetime
                    id(traced_pre),
                    # pack layout must key the executable: a different dataset
                    # with equal n_batches/batch_size would otherwise reuse a
                    # closure over the WRONG spec/treedef and misdecode columns
                    # str(): the cache dict rides the nnx module, whose
                    # flatten sorts keys — raw PyTreeDefs aren't orderable
                    tuple(pack_spec), str(pack_treedef),
                    None if val_scan is None
                    else (val_loader.batch_size, vn, tuple(vspec)),
                )
                if fkey not in fused_cache:
                    fused_cache[fkey] = (self._make_device_epochs_step(
                        loss_fns, task_metrics, n_batches, loader.batch_size,
                        pack_spec, pack_treedef, epochs_static=n_run_epochs,
                        val_scan=val_scan,
                    ), traced_pre)
                (fused_fn, names_out), _ = fused_cache[fkey]
                perms_arg = get_perms_dev() if loader.shuffle else None
                # finish the async uploads before the timer so the measured
                # wall is epoch compute, not tunnel transfer
                jax.block_until_ready(packed_dev)
                if perms_arg is not None:
                    jax.block_until_ready(perms_arg)
                t0 = time.perf_counter()
                params, rest, opt_state, stacked = fused_fn(
                    params, rest, opt_state, packed_dev, perms_arg,
                    jnp.asarray(resumed_step), val_packed=val_packed_dev,
                )
                host = np.asarray(stacked)  # ONE transfer: (n_names, epochs)
                dt = time.perf_counter() - t0
                eps = n_run_epochs * n_batches * loader.batch_size / max(dt, 1e-9)
                nnx.update(self, params, rest)
                for epoch in range(initial_epoch, epochs):
                    epoch_logs = {
                        n: float(host[j, epoch - initial_epoch])
                        for j, n in enumerate(names_out)
                    }
                    epoch_logs["examples_per_sec"] = eps
                    history.append(epoch_logs)
                    if verbose:
                        msg = " - ".join(
                            f"{k}: {v:.4f}" for k, v in epoch_logs.items()
                        )
                        print(f"Epoch {epoch + 1}/{epochs} - {msg}")
                self._store_fit_state(
                    opt_state, params, mesh, resumed_step + n_run_epochs * n_batches
                )
                self.history = history
                return history
        for epoch in range(initial_epoch, epochs):
            metric_states = self._init_metric_states(task_metrics)
            t0 = time.perf_counter()
            n_examples = 0
            # per-batch loss scalars stay on device; averaged once at epoch end
            # (Keras History reports the running epoch mean, not the last batch)
            log_acc: Dict[str, list] = {}
            for cb in callbacks:
                getattr(cb, "on_epoch_begin", lambda *a, **k: None)(epoch)
            if device_data is not None:
                packed_dev, n_rows = device_data
                loader._epoch += 1  # keep shuffle-seed bookkeeping identical
                n_batches = n_rows // loader.batch_size
                if steps_per_epoch is not None:
                    n_batches = min(n_batches, steps_per_epoch)
                perm_dev = get_perms_dev()[epoch - initial_epoch]
                local = 0
                while local < n_batches:
                    k = min(spe, n_batches - local)
                    hits_metrics = has_metrics and any(
                        (global_step + i) % self.train_metrics_steps == 0 for i in range(k)
                    )
                    fn = device_chunk_fn(k, hits_metrics)
                    params, rest, opt_state, metric_states, logs = fn(
                        params, rest, opt_state, metric_states,
                        packed_dev, perm_dev,
                        jnp.asarray(global_step), jnp.asarray(local),
                    )
                    for key, v in logs.items():
                        log_acc.setdefault(key, []).append(v)
                    n_examples += loader.batch_size * k
                    global_step += k
                    local += k
                    for cb in callbacks:
                        getattr(cb, "on_batch_end", lambda *a, **kw: None)(
                            local - 1, {key: v[-1] for key, v in logs.items()}
                        )
                batch_iter = iter(())
            elif device_groups is not None:
                # bucketed device-resident epoch: fused chunk scans PER GROUP
                # (uniform shapes within a group). Batches never mix buckets —
                # drop_last applies per group; steps_per_epoch bounds the
                # epoch's total batch count across groups.
                loader._epoch += 1
                budget = steps_per_epoch if steps_per_epoch is not None else None
                for gkey, packed_dev_g, spec_g, treedef_g, n_rows_g in device_groups:
                    n_batches = n_rows_g // loader.batch_size
                    if budget is not None:
                        n_batches = min(n_batches, budget)
                    if n_batches <= 0:
                        continue
                    perm_dev = get_group_perm(gkey, n_rows_g, epoch - initial_epoch)
                    local = 0
                    while local < n_batches:
                        k = min(spe, n_batches - local)
                        hits_metrics = has_metrics and any(
                            (global_step + i) % self.train_metrics_steps == 0
                            for i in range(k)
                        )
                        fn = device_chunk_fn(k, hits_metrics, spec_g, treedef_g)
                        params, rest, opt_state, metric_states, logs = fn(
                            params, rest, opt_state, metric_states,
                            packed_dev_g, perm_dev,
                            jnp.asarray(global_step), jnp.asarray(local),
                        )
                        for key, v in logs.items():
                            log_acc.setdefault(key, []).append(v)
                        n_examples += loader.batch_size * k
                        global_step += k
                        local += k
                        for cb in callbacks:
                            getattr(cb, "on_batch_end", lambda *a, **kw: None)(
                                local - 1, {key: v[-1] for key, v in logs.items()}
                            )
                    if budget is not None:
                        budget -= n_batches
                        if budget <= 0:
                            break
                batch_iter = iter(())
            elif self._pre_transform is not None or spe > 1:
                batch_iter = iter(loader)
            elif mesh is not None:
                batch_iter = _mesh_prefetch(iter(loader), mesh)
            else:
                batch_iter = _device_prefetch(iter(loader))

            def run_single(step, x, y):
                nonlocal params, emb_params, rest, opt_state, metric_states
                nonlocal global_step, n_examples
                use_metrics = (global_step % self.train_metrics_steps) == 0
                fn = train_step if use_metrics else train_step_fast
                if sparse is not None:
                    params, emb_params, rest, opt_state, metric_states, logs = fn(
                        params, emb_params, rest, opt_state, metric_states, x, y,
                        jnp.asarray(global_step),
                    )
                else:
                    params, rest, opt_state, metric_states, logs = fn(
                        params, rest, opt_state, metric_states, x, y, jnp.asarray(global_step)
                    )
                for k, v in logs.items():
                    log_acc.setdefault(k, []).append(v)
                n_examples += loader.batch_size
                global_step += 1
                for cb in callbacks:
                    getattr(cb, "on_batch_end", lambda *a, **k: None)(step, logs)

            def run_chunk(step, chunk):
                nonlocal params, rest, opt_state, metric_states, global_step, n_examples
                xs = jax.tree_util.tree_map(lambda *a: np.stack(a), *[c[0] for c in chunk])
                y0 = chunk[0][1]
                ys = (
                    None
                    if y0 is None
                    else jax.tree_util.tree_map(lambda *a: np.stack(a), *[c[1] for c in chunk])
                )
                hits_metrics = any(
                    (global_step + i) % self.train_metrics_steps == 0 for i in range(spe)
                )
                fn = multi_step if hits_metrics else multi_step_fast
                params, rest, opt_state, metric_states, logs = fn(
                    params, rest, opt_state, metric_states, xs, ys, jnp.asarray(global_step)
                )
                for k, v in logs.items():
                    log_acc.setdefault(k, []).append(v)
                n_examples += loader.batch_size * spe
                global_step += spe
                for cb in callbacks:
                    getattr(cb, "on_batch_end", lambda *a, **k: None)(
                        step, {k: v[-1] for k, v in logs.items()}
                    )

            chunk: list = []
            for step, (x, y) in enumerate(batch_iter):
                if steps_per_epoch is not None and step >= steps_per_epoch:
                    break
                if self._pre_transform is not None:
                    x, y = self._apply_pre(
                        x, y, training=True, step=global_step + len(chunk)
                    )
                if mesh is not None:
                    from ..parallel.mesh import shard_batch

                    x = shard_batch(x, mesh)
                    y = shard_batch(y, mesh)
                if spe > 1:
                    chunk.append((x, y))
                    if len(chunk) == spe:
                        run_chunk(step, chunk)
                        chunk = []
                else:
                    run_single(step, x, y)
            # leftover batches that didn't fill a chunk run one step at a time
            for i, (x, y) in enumerate(chunk):
                run_single(i, x, y)
            # sync + collect epoch logs: ONE compiled reduction + ONE transfer
            # (an eager mean/concat per key plus eager metric-result math costs
            # a tunnel RTT each — hundreds of ms per epoch through the tunnel)
            epoch_logs = self._collect_epoch_logs(log_acc, metric_states, task_metrics)
            dt = time.perf_counter() - t0
            epoch_logs["examples_per_sec"] = n_examples / max(dt, 1e-9)

            # rebind live state into the model object: the step donates the old
            # buffers, so callbacks reading model state need fresh references
            if emb_params is not None:
                nnx.update(self, params, emb_params, rest)
            else:
                nnx.update(self, params, rest)
            # live epoch-end snapshot: lets ModelCheckpoint persist optimizer
            # slots; _resume_fit_state guards against these buffers being
            # donated by a later (crashed) epoch
            self._store_fit_state(opt_state, params, mesh, global_step)
            if validation_data is not None and (epoch + 1) % validation_freq == 0:
                val = self.evaluate(
                    validation_data, batch_size=batch_size or loader.batch_size, verbose=0,
                    steps=validation_steps,
                    _params=(graphdef, params, rest),
                )
                epoch_logs.update({f"val_{k}": v for k, v in val.items()})
            history.append(epoch_logs)
            if verbose:
                msg = " - ".join(f"{k}: {v:.4f}" for k, v in epoch_logs.items())
                print(f"Epoch {epoch + 1}/{epochs} - {msg}")
            for cb in callbacks:
                getattr(cb, "on_epoch_end", lambda *a, **k: None)(epoch, epoch_logs)
            if self.stop_training:
                break

        if emb_params is not None:
            nnx.update(self, params, emb_params, rest)
        else:
            nnx.update(self, params, rest)
        self._store_fit_state(opt_state, params, mesh, global_step)
        for cb in callbacks:
            getattr(cb, "on_train_end", lambda *a, **k: None)(history.history)
        self.history = history
        return history

    def _collect_epoch_logs(self, log_acc, metric_states, task_metrics) -> Dict[str, float]:
        """Epoch-end scalar collection as ONE jitted reduction + ONE host
        transfer. The scalar names are discovered with ``jax.eval_shape`` (no
        device work) and the compiled fn is cached per log-key structure."""
        if not log_acc and not task_metrics:
            return {}

        def build(logs, mstates):
            vals = {
                k: jnp.mean(jnp.concatenate([jnp.atleast_1d(v) for v in vs]))
                for k, vs in logs.items()
            }
            vals.update(self._metric_results(mstates, task_metrics, fetch=False))
            return vals

        cache = getattr(self, "_epoch_log_cache", None)
        if cache is None:
            cache = self._epoch_log_cache = {}
        key = (tuple(sorted(log_acc)), tuple(len(v) for _, v in sorted(log_acc.items())))
        entry = cache.get(key)
        if entry is None:
            shapes = jax.eval_shape(build, log_acc, metric_states)
            names = sorted(shapes)

            def stacked(logs, mstates):
                vals = build(logs, mstates)
                return jnp.stack(
                    [jnp.asarray(vals[n], jnp.float32).reshape(()) for n in names]
                )

            entry = cache[key] = (names, jax.jit(stacked))
        names, fn = entry
        host = np.asarray(fn(log_acc, metric_states))
        return {n: float(v) for n, v in zip(names, host)}

    def _apply_pre(self, x, y, training: bool, step: int):
        """Apply the ``pre=`` transform to one batch. The transform is traced
        into a JITTED function (cached per (block, training)): on the TPU
        tunnel every eager op costs ~0.4s RTT, so an eagerly-applied sequence
        transform would dominate fit/predict wall-clock. Non-jittable
        transforms (host-side ops) fall back to eager — once, the failure is
        cached."""
        x = to_device_batch(x)
        pre = self._pre_transform

        def eager(x, y):
            context = ModelContext(features=x, targets=y, step=step)
            out = call_block(pre, x, targets=y, training=training, context=context)
            if isinstance(out, tuple):
                return out
            return out, context.targets if context.targets is not None else y

        cache = getattr(self, "_pre_jit_cache", None)
        if cache is None:
            cache = self._pre_jit_cache = {}
        # Key by id(pre) but PIN pre inside the entry: ids are only unique
        # among live objects, and a GC'd transform's address can be reused by
        # the next one (observed: evaluate(pre=A) then evaluate(pre=B) hitting
        # A's compiled step when B landed at A's address).
        key = (id(pre), training)
        entry = cache.get(key)
        if entry is not None and entry[-1] is not pre:
            entry = None  # stale: address reuse after GC
        if entry is not None and entry[0] == "eager":
            return eager(x, y)
        if entry is None:
            graphdef, state = nnx.split(pre)

            def fn(state, x, y, step):
                blk = nnx.merge(graphdef, state)
                context = ModelContext(features=x, targets=y, step=step)
                out = call_block(blk, x, targets=y, training=training, context=context)
                if isinstance(out, tuple):
                    return out
                t = context.get("targets")
                return out, (t if t is not None else y)

            entry = cache[key] = (jax.jit(fn), state, pre)
        jfn, state, _ = entry
        try:
            return jfn(state, x, y, jnp.asarray(step))
        except Exception:
            cache[key] = ("eager", pre)
            return eager(x, y)

    def _pack_for_eval(self, loader):
        """Pack an eval loader's dataset into a device-resident matrix padded
        to whole batches (zero rows, masked by ROW_VALID in the scan).
        Returns ``(packed_dev, n_rows, spec, treedef)`` or None; cached on the
        dataset so per-epoch validation uploads once."""
        if (
            loader.global_size != 1
            or loader.transform is not None
            or getattr(loader, "pad", "max") != "max"
            # a drop_last eval loader drops its tail rows in the streaming
            # path; packing all rows here would silently change the metrics
            or loader.drop_last
        ):
            return None
        bs = loader.batch_size
        ds = loader.dataset
        cache = getattr(ds, "_device_eval_pack", None)
        if cache is not None and cache[0] == bs:
            _, n_rows, spec, treedef, packed_dev = cache
            return packed_dev, n_rows, spec, treedef
        try:
            feats_h, targs_h, n_rows = loader.dense_columns()
        except ValueError:
            return None
        if n_rows == 0:
            return None
        nbytes = sum(
            a.nbytes
            for a in jax.tree_util.tree_leaves((feats_h, targs_h))
            if hasattr(a, "nbytes")
        )
        if nbytes > (1 << 30):
            return None
        packed_h, spec, treedef = self._pack_device_columns(feats_h, targs_h, n_rows)
        n_batches = (n_rows + bs - 1) // bs
        pad = n_batches * bs - n_rows
        if pad:
            packed_h = np.pad(packed_h, ((0, pad), (0, 0)))
        packed_dev = jnp.asarray(packed_h)
        try:
            ds._device_eval_pack = (bs, n_rows, spec, treedef, packed_dev)
            # bound total pinned HBM: packs can be up to 1GB each and live as
            # long as their Dataset — evict the oldest once more than two
            # datasets hold device-resident eval packs
            _EVAL_PACK_LRU.append(weakref.ref(ds))
            while len(_EVAL_PACK_LRU) > 2:
                old = _EVAL_PACK_LRU.popleft()()
                if old is not None and old is not ds:
                    old._device_eval_pack = None
        except AttributeError:
            pass
        return packed_dev, n_rows, spec, treedef

    def _try_device_eval(self, loader, loss_fns, task_metrics):
        """Device-resident fused evaluate: pack the eval dataset into one HBM
        matrix (padded to whole batches, zero rows masked by ROW_VALID — the
        same zero-padding the streaming loader applies to its final partial
        batch, so the two paths agree exactly) and scan every batch in ONE
        dispatch. Returns a callable ``(params, rest) -> (metric_states,
        loss_acc)`` or None when the dataset can't go device-resident. The
        packed matrix is cached on the dataset so per-epoch validation inside
        fit() uploads once, not once per epoch."""
        pack = self._pack_for_eval(loader)
        if pack is None:
            return None
        packed_dev, n_rows, spec, treedef = pack
        bs = loader.batch_size
        # treedef must key the cache too: two datasets with identical spec
        # (column widths/dtypes) but different column names would otherwise
        # share a scan whose closure binds columns to the WRONG feature names.
        # str() because _step_cache rides the nnx module: flatten sorts dict
        # keys, and raw PyTreeDefs aren't orderable
        key = ("eval_scan", bs, n_rows, spec, str(treedef))
        cached = self._step_cache.get(key)
        fn = cached[0] if cached is not None and cached[1] == self._graphdef else None
        if fn is None:
            fn = jax.jit(
                self._device_eval_scan(loss_fns, task_metrics, bs, n_rows, spec, treedef)
            )
            self._step_cache[key] = (fn, self._graphdef)
        return lambda params, rest: fn(params, rest, packed_dev)

    def evaluate(
        self,
        data: Union[Dataset, Loader],
        batch_size: Optional[int] = None,
        return_dict: bool = True,
        pre=None,
        verbose: int = 0,
        steps: Optional[int] = None,
        _params=None,
    ) -> Dict[str, float]:
        if not self._compiled:
            self.compile()
        loader = self._as_loader(data, batch_size, shuffle=False, drop_last=False)
        self.build(loader)
        if _params is None:
            graphdef, params, rest = self._split()
        else:
            graphdef, params, rest = _params
        self._graphdef = graphdef
        loss_fns = self._resolve_task_losses()
        task_metrics = self._resolve_task_metrics()
        mesh = getattr(self, "_mesh", None)
        eval_step = self._make_eval_step(loss_fns, task_metrics, mesh=mesh)
        pre_block = as_block(pre) if pre is not None else None

        metric_states = self._init_metric_states(task_metrics)
        loss_acc = {"total": jnp.zeros(()), "count": jnp.zeros(())}
        fused_eval = None
        if (
            pre_block is None
            and mesh is None
            and self._jit
            and steps is None  # the fused scan always covers every row
            and loader.global_size == 1
            and loader.transform is None
            and getattr(loader, "pad", "max") == "max"
        ):
            fused_eval = self._try_device_eval(loader, loss_fns, task_metrics)
        if fused_eval is not None:
            metric_states, loss_acc = fused_eval(params, rest)
        else:
            batch_iter = (
                iter(loader) if pre_block is not None else _device_prefetch(iter(loader))
            )
            for _step, (x, y) in enumerate(batch_iter):
                if steps is not None and _step >= steps:
                    break
                if pre_block is not None:
                    saved, self._pre_transform = (
                        getattr(self, "_pre_transform", None), pre_block,
                    )
                    x, y = self._apply_pre(x, y, training=False, step=0)
                    self._pre_transform = saved
                if mesh is not None:
                    from ..parallel.mesh import shard_batch

                    x = shard_batch(to_device_batch(x), mesh)
                    y = shard_batch(y, mesh)
                metric_states, loss_acc = eval_step(
                    params, rest, metric_states, loss_acc, x, y
                )
        vals = self._collect_epoch_logs(
            {"loss_total": [loss_acc["total"]], "loss_count": [loss_acc["count"]]},
            metric_states, task_metrics,
        )
        results = {"loss": vals.pop("loss_total") / max(vals.pop("loss_count"), 1.0)}
        results.update(vals)
        if verbose:
            print(" - ".join(f"{k}: {v:.4f}" for k, v in results.items()))
        return results

    def predict(
        self,
        data: Union[Dataset, Loader, dict],
        batch_size: Optional[int] = None,
        pre=None,
    ):
        """``pre=``: a transform applied to each batch before the forward pass
        (reference ``predict_pre``, ``tf/models/base.py:1215``)."""
        if not self._compiled:
            self.compile()
        pre_block = as_block(pre) if pre is not None else None

        def apply_pre(x, y=None):
            if pre_block is None:
                return x
            saved, self._pre_transform = getattr(self, "_pre_transform", None), pre_block
            try:
                x, _ = self._apply_pre(x, y, training=False, step=0)
            finally:
                self._pre_transform = saved
            return x

        if isinstance(data, dict):
            data = apply_pre(data)
            self.build((data, None))
            graphdef, params, rest = self._split()
            self._graphdef = graphdef
            return self._make_predict_step()(params, rest, to_device_batch(data))
        loader = self._as_loader(data, batch_size, shuffle=False, drop_last=False)
        self.build(loader)
        graphdef, params, rest = self._split()
        self._graphdef = graphdef
        predict_step = self._make_predict_step()
        chunks = []
        for x, y in loader:
            x = apply_pre(x, y)
            out = predict_step(params, rest, x)
            valid = np.asarray(x[ROW_VALID_KEY]) if ROW_VALID_KEY in x else None
            out_np = jax.tree_util.tree_map(np.asarray, out)
            if valid is not None and not valid.all():
                out_np = jax.tree_util.tree_map(lambda a: a[valid], out_np)
            chunks.append(out_np)
        if not chunks:
            return None
        return jax.tree_util.tree_map(lambda *xs: np.concatenate(xs, axis=0), *chunks)

    def batch_predict(
        self, data: Union[Dataset, Loader], batch_size: int = 1024, prefix: str = "prediction",
        pre=None,
    ) -> Dataset:
        """Offline sweep → Dataset with prediction columns appended
        (reference ``batch_predict`` ``tf/models/base.py:1559``)."""
        dataset = data.dataset if isinstance(data, Loader) else data
        preds = self.predict(data, batch_size=batch_size, pre=pre)
        table = dataset.to_table()
        import pyarrow as pa

        if isinstance(preds, dict):
            for k, v in preds.items():
                col = v.tolist() if v.ndim > 1 else v
                table = table.append_column(f"{prefix}/{k}", pa.array(col))
        else:
            col = preds.tolist() if preds.ndim > 1 else preds
            table = table.append_column(prefix, pa.array(col))
        return Dataset(table, schema=dataset.schema)

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------
    def summary(self, print_fn=print) -> str:
        """Keras-style model summary: block tree + per-block parameter counts
        (the reference relies on ``keras.Model.summary``)."""
        lines = [f"Model: {type(self).__name__} ({self.block_name or 'model'})"]
        total = 0

        def params_of(block) -> int:
            n = 0
            state = nnx.state(block, nnx.Param) if isinstance(block, nnx.Module) else None
            if state is not None:
                for leaf in jax.tree_util.tree_leaves(state):
                    n += int(np.prod(jnp.shape(leaf)))
            return n

        seen = set()

        def walk(block, depth):
            nonlocal total
            if id(block) in seen:
                return
            seen.add(id(block))
            own = params_of(block)
            name = getattr(block, "block_name", None) or type(block).__name__
            lines.append(f"{'  ' * depth}{name} [{type(block).__name__}]  params={own:,}")
            children = []
            for v in vars(block).values():
                if isinstance(v, Block):
                    children.append(v)
                elif isinstance(v, (nnx.List, list, tuple)):
                    children.extend(x for x in v if isinstance(x, Block))
                elif isinstance(v, (nnx.Dict, dict)):
                    children.extend(x for x in v.values() if isinstance(x, Block))
            for c in children:
                walk(c, depth + 1)

        for b in (getattr(self, "pre", None), *getattr(self, "blocks", []),
                  getattr(self, "post", None)):
            if b is not None:
                walk(b, 1)
        for h in self.heads():
            walk(h, 1)
        total = params_of(self)
        lines.append(f"Total params: {total:,} ({total * 4 / 2**20:.1f} MB fp32)")
        out = "\n".join(lines)
        if print_fn:
            print_fn(out)
        return out

    def save(self, path: str) -> None:
        from ..utils.io import save_model

        save_model(self, path)

    def export_serving(self, path: str, data, batch_size: int = 1024, platforms=None) -> str:
        """Code-free StableHLO serving artifact (+ weights.npz + schema
        sidecars) via ``jax.export`` — the reference's SavedModel-for-Triton
        analog. Loadable with ``mm.load_serving`` or plain jax."""
        from ..utils.io import export_serving

        return export_serving(self, path, data=data, batch_size=batch_size, platforms=platforms)

    @classmethod
    def load(cls, path: str) -> "BaseModel":
        from ..utils.io import load_model

        return load_model(path)

    # ------------------------------------------------------------------
    # freezing (reference tf/models/base.py:2101-2246) — engine-level masks
    # ------------------------------------------------------------------
    def freeze_blocks(self, blocks: Union[str, Block, Sequence[Union[str, Block]]]):
        for b in self._match_blocks(blocks):
            b._frozen = True

    def unfreeze_blocks(self, blocks: Union[str, Block, Sequence[Union[str, Block]]]):
        for b in self._match_blocks(blocks):
            b._frozen = False

    def unfreeze_all_frozen_blocks(self):
        for b in iter_blocks(self):
            if getattr(b, "_frozen", False):
                b._frozen = False

    def frozen_blocks(self):
        return [b for b in iter_blocks(self) if getattr(b, "_frozen", False)]

    def _match_blocks(self, spec):
        if not isinstance(spec, (list, tuple)):
            spec = [spec]
        out = []
        for s in spec:
            if isinstance(s, Block):
                out.append(s)
            else:
                found = [
                    b
                    for b in iter_blocks(self)
                    if getattr(b, "block_name", None) == s
                ]
                if not found:
                    raise ValueError(f"No block named {s!r}")
                out.extend(found)
        return out


class Model(BaseModel):
    """A sequential container of blocks ending in output head(s)
    (reference ``Model`` ``tf/models/base.py:1621``)."""

    def __init__(self, *blocks, schema: Optional[Schema] = None, pre=None, post=None):
        super().__init__(schema=schema)
        flat = []
        for b in blocks:
            flat.append(as_block(b))
        self.blocks = nnx.List(flat)
        self.pre = as_block(pre) if pre is not None else None
        self.post = as_block(post) if post is not None else None
        if schema is None:
            for b in flat:
                s = getattr(b, "schema", None)
                if s is not None:
                    self.schema = s
                    break

    @classmethod
    def from_block(cls, block, schema: Optional[Schema] = None, **kwargs) -> "Model":
        return cls(block, schema=schema, **kwargs)

    def __call__(self, inputs, *, targets=None, training=False, context=None, **kwargs):
        if context is None:
            context = ModelContext(features=inputs, targets=targets)
        else:
            context.setdefault("features", inputs)
            if targets is not None:
                context["targets"] = targets
        out = inputs
        if self.pre is not None:
            out = call_block(self.pre, out, targets=targets, training=training, context=context)
        for block in self.blocks:
            out = call_block(block, out, targets=targets, training=training, context=context)
        if self.post is not None:
            out = call_block(self.post, out, targets=targets, training=training, context=context)
        return out

    @property
    def first(self) -> Block:
        return self.blocks[0]

    @property
    def last(self) -> Block:
        return self.blocks[-1]


class ModelBlock(Model):
    """Turn any block into a trainable model (reference ``ModelBlock:185``)."""

    pass
