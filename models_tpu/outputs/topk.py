"""Top-k retrieval layers (reference ``merlin/models/tf/outputs/topk.py`` +
``tf/core/index.py``).

``BruteForce`` holds the full candidate-embedding matrix and ids as non-trainable
state; querying is one (B,D)x(D,C) matmul + ``lax.top_k``. On one chip XLA already
runs this near roofline for moderate catalogs; the sharded/tiled Pallas variant
(``models_tpu/ops/topk.py``) handles catalogs that exceed one chip's HBM by
row-sharding candidates across the mesh and merging per-shard partial top-k.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..core.block import Block
from ..core.types import Prediction, TopKPrediction
from ..registry import topk_registry


class TopKLayer(Block):
    """ABC: ``index()`` then ``__call__(queries) -> TopKPrediction``."""

    def __init__(self, k: int = 10):
        super().__init__()
        self.k = int(k)

    def index(self, candidates: jnp.ndarray, ids: Optional[jnp.ndarray] = None) -> "TopKLayer":
        raise NotImplementedError

    def index_from_dataset(self, dataset, check_unique_ids: bool = True,
                           dtype=jnp.float32) -> "TopKLayer":
        """Index from a Dataset with columns id + embedding (or id + vector cols)."""
        data = dataset.to_numpy_dict() if hasattr(dataset, "to_numpy_dict") else dataset
        id_col = "id" if "id" in data else next(iter(data))
        ids = np.asarray(data[id_col])
        if "embedding__values" in data:
            values = data["embedding__values"]
            dim = len(values) // len(ids)
            emb = values.reshape(len(ids), dim)
        elif "embedding" in data:
            emb = np.asarray(list(data["embedding"]))
        else:
            # the id source column must NOT ride into the embedding matrix —
            # stacking raw ids as a vector dimension distorts every score
            cols = [c for c in data if c != id_col]
            emb = np.stack([data[c] for c in cols], axis=1)
        if check_unique_ids:
            self._check_unique_ids(ids)
        return self.index(jnp.asarray(emb), jnp.asarray(ids), dtype=dtype)

    @staticmethod
    def _check_unique_ids(ids) -> None:
        # reference TopKLayer._check_unique_ids (topk.py:83-86)
        arr = np.asarray(ids)
        if len(np.unique(arr)) != len(arr):
            raise ValueError("Candidate ids must be unique to build a top-k index")


@topk_registry.register_with_multiple_names("brute-force-topk", "brute-force")
class BruteForce(TopKLayer):
    """Exact top-k over the full candidate matrix (reference ``topk.py:129``).

    With a mesh (``index(mesh=...)`` or an engine-provided ``context["mesh"]``)
    the candidate matrix is row-sharded over the ``model`` axis and queries run
    through :func:`sharded_topk`: per-shard partial k-lists are all-gathered
    and merged, so only (B, k) rides ICI — catalogs can exceed one chip's HBM
    (SURVEY §5's "long axis"; reference equivalent ``tf/outputs/topk.py:129``).
    """

    def __init__(self, k: int = 10):
        super().__init__(k=k)
        self.candidates = nnx.data(None)
        self.ids = nnx.data(None)
        self.scales = nnx.data(None)  # per-row dequant scales (int8 index only)
        self.mesh = None
        self.n_valid = None  # real (unpadded) candidate count

    def index(
        self, candidates: jnp.ndarray, ids: Optional[jnp.ndarray] = None, mesh=None,
        dtype=jnp.float32,
    ) -> "BruteForce":
        """``dtype=jnp.bfloat16`` stores the candidate matrix half-width: the
        serving top-k is HBM-bound on streaming the catalog (phase A of the
        binned kernel reads every row every query batch), so this halves the
        dominant cost. Scoring stays exact w.r.t. the quantized index (both
        phases read the same rows — the standard vector-DB trade).

        ``dtype=jnp.int8`` stores a BIN-QUANTIZED index: rows are sorted by
        max-magnitude so each ``bin_size`` block holds similar-norm rows, and
        every block shares ONE symmetric 127-level scale (``row = q_int8 *
        scale_bin``). The catalog stream drops to 1 byte/element (4× less HBM
        than fp32) and — because a positive per-bin constant commutes with the
        per-bin max — the binned kernel's phase A stays int32 end-to-end
        inside the conv+reduce fusion (HLO-verified; a per-ROW scale would
        force a 1 GB dequant intermediate at 1M×128). Ranking is exact w.r.t.
        the quantized scores; the norm-sorting keeps per-bin scales within a
        few percent of per-row ones (recall vs the fp32 index measured in
        ``tests/unit/test_ops.py``). On a mesh, bin quantization composes
        with row sharding whenever each shard is a whole number of bins
        (``C %% (n_shards * bin_size) == 0``); otherwise the index falls back
        to per-ROW scales (exact, just without the fused int32 phase A).

        The stored matrix is zero-padded here, ONCE, to a bin multiple so the
        serving trace consumes it exactly once (any in-trace tail handling
        forces XLA to copy the whole matrix — +1.4 ms at 1M x 128 on v5e, r5);
        ``n_valid`` masks the padding in the binned kernel's tiny pool."""
        from ..ops.topk import _BINNED_BIN_SIZE
        from ..parallel.mesh import MODEL_AXIS

        n = jnp.asarray(candidates).shape[0]
        if ids is None:
            ids = jnp.arange(n, dtype=jnp.int32)
        ids = jnp.asarray(ids)
        mesh = mesh if mesh is not None else self.mesh
        use_mesh = mesh is not None and self._mesh_fits(mesh, n)
        scales = None
        self.scales_per_bin = False
        if dtype == jnp.int8:
            from ..parallel.mesh import MODEL_AXIS as _MA

            cand_f = jnp.asarray(candidates, dtype=jnp.float32)
            amax = jnp.max(jnp.abs(cand_f), axis=1)
            n_shards = dict(mesh.shape).get(_MA, 1) if use_mesh else 1
            if use_mesh and n % (n_shards * _BINNED_BIN_SIZE) != 0:
                # per-row scales (these shard boundaries aren't bin-aligned)
                scales = jnp.where(amax > 0, amax, 1.0) / 127.0  # (C,) f32
            elif use_mesh:
                # shards are bin multiples: bin quantization composes with row
                # sharding (each shard sees whole bins with constant scales)
                order = jnp.argsort(amax)
                cand_f = jnp.take(cand_f, order, axis=0)
                ids = jnp.take(ids, order)
                amax = jnp.take(amax, order)
                bin_amax = amax.reshape(-1, _BINNED_BIN_SIZE).max(axis=1)
                bin_scale = jnp.where(bin_amax > 0, bin_amax, 1.0) / 127.0
                scales = jnp.repeat(bin_scale, _BINNED_BIN_SIZE)
                self.scales_per_bin = True
            else:
                # bin quantization: norm-sort rows, pad, one scale per bin
                order = jnp.argsort(amax)
                cand_f = jnp.take(cand_f, order, axis=0)
                ids = jnp.take(ids, order)
                amax = jnp.take(amax, order)
                pad = (-n) % _BINNED_BIN_SIZE
                if pad:
                    cand_f = jnp.pad(cand_f, ((0, pad), (0, 0)))
                    ids = jnp.pad(ids, (0, pad), constant_values=-1)
                    amax = jnp.pad(amax, (0, pad))
                bin_amax = amax.reshape(-1, _BINNED_BIN_SIZE).max(axis=1)
                bin_scale = jnp.where(bin_amax > 0, bin_amax, 1.0) / 127.0
                scales = jnp.repeat(bin_scale, _BINNED_BIN_SIZE)  # bin-constant
                self.scales_per_bin = True
            candidates = jnp.clip(
                jnp.round(cand_f / scales[:, None]), -127, 127
            ).astype(jnp.int8)
        else:
            candidates = jnp.asarray(candidates, dtype=dtype)
        self.n_valid = int(n)
        if use_mesh:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.mesh = mesh
            candidates = jax.device_put(candidates, NamedSharding(mesh, P(MODEL_AXIS, None)))
            ids = jax.device_put(ids, NamedSharding(mesh, P(MODEL_AXIS)))
            if scales is not None:
                scales = jax.device_put(scales, NamedSharding(mesh, P(MODEL_AXIS)))
        elif candidates.shape[0] == n:  # int8 path already padded above
            pad = (-n) % _BINNED_BIN_SIZE
            if pad:
                candidates = jnp.pad(candidates, ((0, pad), (0, 0)))
                ids = jnp.pad(ids, (0, pad), constant_values=-1)
        self.candidates = nnx.Variable(candidates)
        self.ids = nnx.Variable(jnp.asarray(ids))
        self.scales = nnx.Variable(scales) if scales is not None else nnx.data(None)
        return self

    @staticmethod
    def _mesh_fits(mesh, n_candidates: int) -> bool:
        from ..parallel.mesh import MODEL_AXIS

        n = dict(mesh.shape).get(MODEL_AXIS, 1)
        return n > 1 and n_candidates % n == 0

    @property
    def num_candidates(self) -> int:
        if self.n_valid is not None:
            return self.n_valid
        return self.candidates.value.shape[0]

    def __call__(self, queries, *, k: Optional[int] = None, context=None, **kwargs) -> TopKPrediction:
        if self.candidates is None:
            raise ValueError("BruteForce index is empty; call index() first")
        k = k or self.k
        mesh = self.mesh
        if mesh is None and context is not None:
            mesh = context.get("mesh")
        scales_var = getattr(self, "scales", None)  # legacy pickles lack the attr
        scales = scales_var.value if scales_var is not None else None
        if mesh is not None and self._mesh_fits(mesh, self.candidates.value.shape[0]):
            from ..ops.topk import sharded_topk
            from ..parallel.mesh import MODEL_AXIS

            top_scores, top_ids = sharded_topk(
                queries, self.candidates.value, k, mesh, axis=MODEL_AXIS,
                ids=self.ids.value, col_scale=scales,
                col_scale_per_bin=getattr(self, "scales_per_bin", False),
            )
            return TopKPrediction(top_scores, top_ids)
        from ..ops.topk import topk_scores

        # tiled kernel for big catalogs (never materializes (B, C) in HBM);
        # direct fused matmul+top_k for small ones
        top_scores, top_ids = topk_scores(
            queries, self.candidates.value, k, ids=self.ids.value,
            n_valid=self.n_valid, col_scale=scales,
            col_scale_per_bin=getattr(self, "scales_per_bin", False),
        )
        return TopKPrediction(top_scores, top_ids)

    def score_all(self, queries) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Full (B, C) score matrix + ids — used by corpus evaluation
        (padding rows sliced off; this path materializes (B, C) anyway)."""
        cand, ids = self.candidates.value, self.ids.value
        scales_var = getattr(self, "scales", None)  # legacy pickles lack the attr
        scales = scales_var.value if scales_var is not None else None
        if self.n_valid is not None and self.n_valid < cand.shape[0]:
            cand, ids = cand[: self.n_valid], ids[: self.n_valid]
            if scales is not None:
                scales = scales[: self.n_valid]
        if jnp.issubdtype(cand.dtype, jnp.integer):
            cand = cand.astype(queries.dtype)
        scores = jnp.matmul(queries, cand.T, preferred_element_type=jnp.float32)
        if scales is not None:
            scores = scores * scales[None, :]
        return scores, ids


from ..outputs.base import ModelOutput


class TopKOutput(ModelOutput):
    """Head wrapping a TopKLayer; eval emits relevance-at-top-k + the
    ``label_relevant_counts`` side channel (reference ``topk.py:247``)."""

    default_loss = None  # retrieval eval has no trainable loss

    def __init__(self, to_call: Union[str, TopKLayer] = "brute-force-topk", k: int = 10,
                 candidates=None, item_id_name: Optional[str] = None,
                 default_metrics_top_ks=(10,), mesh=None, candidate_dtype=None):
        ModelOutput.__init__(self, to_call=None, target=item_id_name, task_name="topk_output")
        if isinstance(to_call, str):
            to_call = topk_registry.parse(to_call, k=k)
        self.topk_layer = to_call
        if mesh is not None:
            self.topk_layer.mesh = mesh
        self.k = k
        self.item_id_name = item_id_name
        self.top_ks = tuple(default_metrics_top_ks)
        candidate_dtype = jnp.float32 if candidate_dtype is None else candidate_dtype
        if candidates is not None:
            if hasattr(candidates, "to_numpy_dict"):
                self.topk_layer.index_from_dataset(candidates, dtype=candidate_dtype)
            elif isinstance(candidates, tuple):
                self.topk_layer.index(candidates[0], candidates[1], dtype=candidate_dtype)
            else:
                self.topk_layer.index(jnp.asarray(candidates), dtype=candidate_dtype)

    def default_metrics(self):
        from ..metrics.topk import TopKMetricsAggregator

        return [TopKMetricsAggregator.default(min(k, self.k)) for k in self.top_ks]

    def __call__(self, inputs, *, training=False, context=None, targets=None, **kwargs):
        queries = inputs["query"] if isinstance(inputs, dict) else inputs
        topk = self.topk_layer(queries, k=self.k, context=context)
        # eval mode ONLY with explicit targets or under the engine's testing flag —
        # a batch merely containing the item-id feature is still a serving request
        testing = bool(context.get("testing", False)) if context is not None else False
        true_ids = None
        if targets is not None and not isinstance(targets, dict):
            true_ids = targets
        elif isinstance(targets, dict) and self.item_id_name in targets:
            true_ids = targets[self.item_id_name]
        elif testing and context is not None and self.item_id_name is not None:
            true_ids = context.features.get(self.item_id_name)
        if true_ids is None:
            return topk  # pure inference

        # eval: relevance = does the true item appear in the top-k list; the
        # label_relevant_counts side channel records 1 relevant item per row
        rel = (topk.identifiers == true_ids.reshape(-1, 1)).astype(jnp.float32)
        return Prediction(
            outputs=topk.scores,
            targets=rel,
            label_relevant_counts=jnp.ones(rel.shape[0], dtype=jnp.float32),
        )
