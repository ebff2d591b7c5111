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


def _kround_topk(values: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k of a (B, W) matrix by k rounds of max-extract (first-position
    tie-break). For small W this is far cheaper on TPU than ``lax.top_k``'s
    sort-based lowering (a handful of VPU passes per round, no sort)."""
    B, W = values.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    out_v, out_p = [], []
    v = values
    for _ in range(k):
        m = jnp.max(v, axis=1)
        pos = jnp.min(jnp.where(v == m[:, None], iota, W), axis=1)
        out_v.append(m)
        out_p.append(pos)
        v = jnp.where(iota == pos[:, None], NEG_INF, v)
    return jnp.stack(out_v, axis=1), jnp.stack(out_p, axis=1)


_BINNED_BIN_SIZE = 128
_BINNED_MARGIN = 2


def binned_topk(
    queries: jnp.ndarray,
    candidates: jnp.ndarray,
    k: int,
    ids: Optional[jnp.ndarray] = None,
    bin_size: int = _BINNED_BIN_SIZE,
    bin_margin: int = _BINNED_MARGIN,
    phase_a_precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Provably-exact two-phase top-k at near-matmul speed (pure XLA, no
    Pallas, no data-dependent control flow).

    Phase A: score all candidates, reduce each ``bin_size``-column bin to its
    max. XLA-fusion-critical details (each mistake costs a full (B, C) score
    matrix round-trip through HBM, ~1 GB at B=256 x C=1M — the naive path's
    problem, reference ``tf/outputs/topk.py:221``):
    - reshape the CANDIDATES to (L, bs, D) and emit (B, L, bs) directly;
      reshaping the (B, C) score output breaks the matmul+reduce fusion;
    - never pad/concat the candidate matrix inside the traced function (a
      512 MB copy per call); the non-multiple-of-bin tail is scored by a tiny
      separate matmul and unconditionally appended to the rescore pool.

    Phase B: pick the top-(k+margin) *bins* per row — itself two-level
    (group maxima first; k rounds over (B, L/16) are ~free while rounds over
    the full (B, L) cost ~6 HBM passes each) — then gather just those bins'
    candidate rows and rescore them (k·bin_size columns ≈ 0.1-1%% of the
    catalog).

    Exactness: every element strictly greater than the true k-th score θ lives
    in a bin whose max exceeds θ, and at most k-1 bins do — so all such bins
    rank in the top-k bins by max; the selected pool also holds ≥ k elements
    ≥ θ (one per selected bin). The proof holds when phase A and phase B score
    identically; on TPU both run at DEFAULT matmul precision (bf16 multiply,
    f32 accumulate) but through differently-shaped einsums, so accumulation
    order can differ by ~1 ulp — ``bin_margin`` extra bins absorb that (the
    margin is a measured buffer, not part of the proof; an element whose
    phase-A bin max rounds below the (k+margin)-th bin threshold could in
    principle be dropped — never observed across the bf16 sweep in
    ``tests/unit/test_ops.py::test_binned_topk_bf16_sweep_matches_naive``).
    ``phase_a_precision``: pass ``jax.lax.Precision.HIGHEST`` to run phase A's
    scoring in full f32 (≈2-3x phase-A cost) when bitwise-robust selection
    against adversarial near-tie catalogs matters more than speed.
    Measured on TPU v5e (1M×128 catalog, B=256, k=10): ~1.3 ms vs 7.7 ms for
    the Pallas streaming kernel (whose k-round merge over every tile is
    VPU-bound) and ~620 ms naive.
    """
    B, D = queries.shape
    C = candidates.shape[0]
    if ids is not None:
        ids = ids.astype(jnp.int32)
    L = C // bin_size  # number of full bins
    r = C - L * bin_size  # tail columns (0 <= r < bin_size)
    if L <= k:
        scores = jnp.matmul(queries, candidates.T, preferred_element_type=jnp.float32)
        s, pos = _kround_topk(scores, min(k, C))
        if ids is None:
            return s, pos
        return s, jnp.take(ids, pos)

    # Phase A: fused matmul -> per-bin max over the full bins
    c3 = candidates[: L * bin_size].reshape(L, bin_size, D)
    bin_max = jnp.max(
        jnp.einsum(
            "bd,lsd->bls", queries, c3,
            preferred_element_type=jnp.float32, precision=phase_a_precision,
        ),
        axis=2,
    )  # (B, L)

    # Phase B: exact top-(k+margin) bins (two-level selection)
    kb = min(k + bin_margin, L)
    GROUP = 16
    if L // GROUP > kb:
        Lp = -(-L // GROUP) * GROUP
        bin_max_p = (
            jnp.pad(bin_max, ((0, 0), (0, Lp - L)), constant_values=NEG_INF)
            if Lp != L
            else bin_max
        )
        Lg = Lp // GROUP
        group_max = jnp.max(bin_max_p.reshape(B, Lg, GROUP), axis=2)  # (B, Lg)
        _, grp_idx = _kround_topk(group_max, kb)  # (B, kb) group indices
        bin_cols = (
            grp_idx[:, :, None] * GROUP
            + jax.lax.broadcasted_iota(jnp.int32, (1, 1, GROUP), 2)
        ).reshape(B, kb * GROUP)
        in_range = bin_cols < L
        bin_pool = jnp.take_along_axis(bin_max, jnp.minimum(bin_cols, L - 1), axis=1)
        bin_pool = jnp.where(in_range, bin_pool, NEG_INF)
        _, pool_pos = _kround_topk(bin_pool, kb)
        bin_idx = jnp.take_along_axis(bin_cols, pool_pos, axis=1)
    else:
        _, bin_idx = _kround_topk(bin_max, kb)  # (B, kb) bin indices

    # gather the selected bins and rescore; the tail joins unconditionally
    gathered = jnp.take(c3, bin_idx, axis=0)  # (B, kb, bs, D)
    pool_s = jnp.einsum(
        "bd,bksd->bks", queries, gathered, preferred_element_type=jnp.float32
    ).reshape(B, kb * bin_size)
    cols = (
        bin_idx[:, :, None] * bin_size
        + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bin_size), 2)
    ).reshape(B, kb * bin_size)
    if r:
        tail = candidates[L * bin_size :]  # (r, D) static slice
        s_tail = jnp.matmul(queries, tail.T, preferred_element_type=jnp.float32)
        pool_s = jnp.concatenate([pool_s, s_tail], axis=1)
        tail_cols = jnp.broadcast_to(
            L * bin_size + jnp.arange(r, dtype=jnp.int32)[None, :], (B, r)
        )
        cols = jnp.concatenate([cols, tail_cols], axis=1)
    top_s, top_p = _kround_topk(pool_s, k)
    top_cols = jnp.take_along_axis(cols, top_p, axis=1)
    if ids is None:
        return top_s, top_cols
    return top_s, jnp.take(ids, top_cols)


def topk_scores(
    queries: jnp.ndarray,
    candidates: jnp.ndarray,
    k: int,
    ids: Optional[jnp.ndarray] = None,
    tile: int = 4096,
    prefer_pallas: Optional[bool] = None,
    method: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch: binned two-phase (fastest, exact, pure XLA) when the bin pool
    fits comfortably; Pallas streaming kernel or blockwise scan for very large
    query batches (their memory is O(B·k) regardless of B). Small catalogs
    (≤ one tile) use the direct matmul+top_k (XLA fuses it fine at that size).

    ``method``: 'auto' | 'binned' | 'pallas' | 'blockwise'.
    """
    C = candidates.shape[0]
    if method == "auto" and C <= tile:
        scores = jnp.matmul(queries, candidates.T, preferred_element_type=jnp.float32)
        s, idx = jax.lax.top_k(scores, k)
        if ids is None:
            return s, idx.astype(jnp.int32)
        return s, jnp.take(ids, idx)
    on_tpu = jax.default_backend() == "tpu"
    explicit = method != "auto"
    if prefer_pallas is not None and method == "auto":
        # legacy knob: selects the kernel but keeps graceful fallback semantics
        method = "pallas" if prefer_pallas else "blockwise"
    B = queries.shape[0]
    D = queries.shape[1]
    # binned phase-B buffer: (B, k+margin bins, bin_size, D) candidate gather
    gather_bytes = B * (k + _BINNED_MARGIN) * _BINNED_BIN_SIZE * D * 4
    if method == "binned" or (method == "auto" and gather_bytes <= 512 * 2**20):
        return binned_topk(queries, candidates, k, ids=ids)
    if method == "pallas" or (method == "auto" and on_tpu):
        try:
            return pallas_topk(queries, candidates, k, ids=ids, tile=min(tile, 4096))
        except Exception:  # Mosaic lowering gap → fall back
            if explicit and method == "pallas":
                raise
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
        if cand_shard.shape[0] // 128 > k:
            # binned two-phase kernel (pure XLA — composes with shard_map)
            s, i = binned_topk(q, cand_shard, k, ids=id_shard)
        else:
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
