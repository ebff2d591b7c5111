"""Tiled dot-product + top-k over a large candidate matrix.

The retrieval hot path (SURVEY.md §5: the "long axis" is the catalog): computing
``queries @ candidates.T`` then ``top_k`` naively materializes a (B, C) score
matrix in HBM — 32 GB for B=8192, C=1M — and the reference's BruteForce does
exactly that on one GPU (``tf/outputs/topk.py:221-223``). Here:

- :func:`blockwise_topk` — ``lax.scan`` over candidate tiles with a running
  (B, k) merge; scores exist only one tile at a time. Works on every backend and
  is the building block for the mesh-sharded path (each shard scans its rows,
  partial lists are all-gathered and merged).
- :func:`pallas_topk` — the same loop as a single Pallas kernel: candidate tiles
  stream HBM→VMEM, the (B,T) score tile never leaves VMEM, and the running
  (B, k) state lives in the output block across grid steps. MXU does the scores,
  the merge is one ``top_k`` over (B, k+T) per tile.
- :func:`sharded_topk` — shard_map over a mesh axis: row-sharded candidates,
  local (pallas or blockwise) top-k, all-gather + final merge.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.finfo(jnp.float32).min


def _pad_candidates(candidates: jnp.ndarray, ids, tile: int):
    c = candidates.shape[0]
    pad = (-c) % tile
    if pad:
        candidates = jnp.pad(candidates, ((0, pad), (0, 0)))
        if ids is not None:
            ids = jnp.pad(ids, (0, pad), constant_values=-1)
    return candidates, ids, c


def blockwise_topk(
    queries: jnp.ndarray,
    candidates: jnp.ndarray,
    k: int,
    ids: Optional[jnp.ndarray] = None,
    tile: int = 4096,
    _pvary_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k without materializing (B, C): scan candidate tiles, merge a
    running (B, k) best-list. Returns (scores (B,k), ids (B,k)).

    ``_pvary_axis``: set by sharded_topk when running under shard_map so the scan
    carry init is marked varying over the mesh axis (shard_map type system)."""
    B, D = queries.shape
    candidates, ids, c_real = _pad_candidates(candidates, ids, tile)
    n_tiles = candidates.shape[0] // tile
    cand_tiles = candidates.reshape(n_tiles, tile, D)
    if ids is None:
        ids = jnp.arange(candidates.shape[0], dtype=jnp.int32)
    id_tiles = ids.reshape(n_tiles, tile)
    valid_tiles = (jnp.arange(n_tiles * tile).reshape(n_tiles, tile) < c_real)

    init_scores = jnp.full((B, k), NEG_INF, dtype=jnp.float32)
    init_ids = jnp.full((B, k), -1, dtype=ids.dtype)
    if _pvary_axis is not None:
        init_scores = jax.lax.pcast(init_scores, (_pvary_axis,), to="varying")
        init_ids = jax.lax.pcast(init_ids, (_pvary_axis,), to="varying")

    def body(carry, tile_data):
        best_s, best_i = carry
        cand, tids, valid = tile_data
        scores = jnp.matmul(queries, cand.T, preferred_element_type=jnp.float32)
        scores = jnp.where(valid[None, :], scores, NEG_INF)
        all_s = jnp.concatenate([best_s, scores], axis=1)
        all_i = jnp.concatenate([best_i, jnp.broadcast_to(tids[None, :], scores.shape)], axis=1)
        new_s, idx = jax.lax.top_k(all_s, k)
        new_i = jnp.take_along_axis(all_i, idx, axis=1)
        return (new_s, new_i), None

    (best_s, best_i), _ = jax.lax.scan(
        body, (init_scores, init_ids), (cand_tiles, id_tiles, valid_tiles)
    )
    return best_s, best_i


def pallas_topk(
    queries: jnp.ndarray,
    candidates: jnp.ndarray,
    k: int,
    ids: Optional[jnp.ndarray] = None,
    tile: int = 4096,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused scores+top-k Pallas kernel.

    Grid iterates candidate tiles; the (B, k) running best scores/ids live in the
    output blocks (constant index_map → VMEM-resident across steps). Per step:
    one (B,D)x(D,T) MXU matmul + top_k merge over (B, k+T).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, D = queries.shape
    candidates, ids, c_real = _pad_candidates(candidates, ids, tile)
    if ids is None:
        ids = jnp.arange(candidates.shape[0], dtype=jnp.int32)
    ids = ids.astype(jnp.int32)
    n_tiles = candidates.shape[0] // tile

    def kernel(q_ref, cand_ref, ids_ref, out_s_ref, out_i_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
            out_i_ref[:] = jnp.full_like(out_i_ref, -1)

        scores = jnp.dot(q_ref[:], cand_ref[:].T, preferred_element_type=jnp.float32)
        # mask padded candidate rows (global index >= c_real)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) + t * tile
        scores = jnp.where(col < c_real, scores, NEG_INF)
        tile_ids = jnp.broadcast_to(ids_ref[:].reshape(1, tile), scores.shape)

        all_s = jnp.concatenate([out_s_ref[:], scores], axis=1)
        all_i = jnp.concatenate([out_i_ref[:], tile_ids], axis=1)

        # Mosaic has no top_k primitive: select the k best with k rounds of
        # masked max (VPU reductions over (B, k+T) — cheap next to the matmul)
        width = all_s.shape[1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (B, width), 1)
        new_s = []
        new_i = []
        for j in range(k):
            m = jnp.max(all_s, axis=1)  # (B,)
            hit = all_s == m[:, None]
            pos = jnp.min(jnp.where(hit, iota, width), axis=1)  # first occurrence
            sel = iota == pos[:, None]
            picked_id = jnp.sum(jnp.where(sel, all_i, 0), axis=1)
            new_s.append(m)
            new_i.append(picked_id)
            all_s = jnp.where(sel, NEG_INF, all_s)
        out_s_ref[:] = jnp.stack(new_s, axis=1)
        out_i_ref[:] = jnp.stack(new_i, axis=1)

    grid = (n_tiles,)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, D), lambda t: (0, 0)),
            pl.BlockSpec((tile, D), lambda t: (t, 0)),
            pl.BlockSpec((tile,), lambda t: (t,)),
        ],
        out_specs=[
            pl.BlockSpec((B, k), lambda t: (0, 0)),
            pl.BlockSpec((B, k), lambda t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, k), jnp.float32),
            jax.ShapeDtypeStruct((B, k), jnp.int32),
        ],
        interpret=interpret,
    )(queries, candidates, ids)
    return out_s, out_i


def topk_scores(
    queries: jnp.ndarray,
    candidates: jnp.ndarray,
    k: int,
    ids: Optional[jnp.ndarray] = None,
    tile: int = 4096,
    prefer_pallas: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch: Pallas kernel on TPU, blockwise scan elsewhere. Small catalogs
    (≤ one tile) use the direct matmul+top_k (XLA fuses it fine at that size)."""
    C = candidates.shape[0]
    if C <= tile:
        scores = jnp.matmul(queries, candidates.T, preferred_element_type=jnp.float32)
        s, idx = jax.lax.top_k(scores, k)
        if ids is None:
            return s, idx.astype(jnp.int32)
        return s, jnp.take(ids, idx)
    if prefer_pallas is None:
        prefer_pallas = jax.default_backend() == "tpu"
    if prefer_pallas:
        try:
            return pallas_topk(queries, candidates, k, ids=ids, tile=min(tile, 4096))
        except Exception:  # Mosaic lowering gap → fall back
            pass
    return blockwise_topk(queries, candidates, k, ids=ids, tile=tile)


def sharded_topk(
    queries: jnp.ndarray,
    candidates: jnp.ndarray,
    k: int,
    mesh,
    axis: str = "model",
    ids: Optional[jnp.ndarray] = None,
    tile: int = 4096,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k over a row-sharded candidate matrix.

    Each device scans its candidate rows (queries replicated), then the per-shard
    (B, k) partial lists are all-gathered over ``axis`` and merged — the k-list
    (tiny) rides ICI instead of the full score matrix. This is the multi-chip
    BASELINE.json north-star query path.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard_map = jax.shard_map

    C, D = candidates.shape
    n_shards = mesh.shape[axis]
    if ids is None:
        ids = jnp.arange(C, dtype=jnp.int32)

    def local_topk(q, cand_shard, id_shard):
        s, i = blockwise_topk(
            q, cand_shard, k, ids=id_shard, tile=min(tile, cand_shard.shape[0]),
            _pvary_axis=axis,
        )
        # gather partial lists from every shard and merge
        all_s = jax.lax.all_gather(s, axis)  # (n_shards, B, k)
        all_i = jax.lax.all_gather(i, axis)
        all_s = jnp.moveaxis(all_s, 0, 1).reshape(q.shape[0], n_shards * k)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(q.shape[0], n_shards * k)
        best_s, idx = jax.lax.top_k(all_s, k)
        best_i = jnp.take_along_axis(all_i, idx, axis=1)
        return best_s, best_i

    fn = shard_map(
        local_topk,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis)),
        out_specs=(P(), P()),
        # the all_gather+merge makes outputs bitwise-identical on every shard,
        # but the varying-axis checker can't infer that
        check_vma=False,
    )
    return fn(queries, candidates, ids)
