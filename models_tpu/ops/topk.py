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
    col_scale: Optional[jnp.ndarray] = None,
    _pvary_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k without materializing (B, C): scan candidate tiles, merge a
    running (B, k) best-list. Returns (scores (B,k), ids (B,k)).

    ``col_scale``: optional per-candidate dequantization scale (C,) f32 — used
    by the int8 index (score = (q · c_int8) * scale_c, fused into the matmul
    epilogue).

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
    if col_scale is not None:
        pad = n_tiles * tile - col_scale.shape[0]
        scale_tiles = jnp.pad(
            col_scale.astype(jnp.float32), (0, pad), constant_values=1.0
        ).reshape(n_tiles, tile)

    init_scores = jnp.full((B, k), NEG_INF, dtype=jnp.float32)
    init_ids = jnp.full((B, k), -1, dtype=ids.dtype)
    if _pvary_axis is not None:
        init_scores = jax.lax.pcast(init_scores, (_pvary_axis,), to="varying")
        init_ids = jax.lax.pcast(init_ids, (_pvary_axis,), to="varying")

    def body(carry, tile_data):
        best_s, best_i = carry
        cand, tids, valid = tile_data[:3]
        if jnp.issubdtype(cand.dtype, jnp.integer):
            cand = cand.astype(queries.dtype)  # int8 index: convert fuses into the dot
        scores = jnp.matmul(queries, cand.T, preferred_element_type=jnp.float32)
        if col_scale is not None:
            scores = scores * tile_data[3][None, :]
        scores = jnp.where(valid[None, :], scores, NEG_INF)
        all_s = jnp.concatenate([best_s, scores], axis=1)
        all_i = jnp.concatenate([best_i, jnp.broadcast_to(tids[None, :], scores.shape)], axis=1)
        new_s, idx = jax.lax.top_k(all_s, k)
        new_i = jnp.take_along_axis(all_i, idx, axis=1)
        return (new_s, new_i), None

    xs = (cand_tiles, id_tiles, valid_tiles)
    if col_scale is not None:
        xs = xs + (scale_tiles,)
    (best_s, best_i), _ = jax.lax.scan(body, (init_scores, init_ids), xs)
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


# chip-swept r5 (1M x 128, B=256, k=10, lax.top_k selection): bin 64 gives
# fp32 1.23 / bf16 0.93 ms vs 1.96/1.00 at 128 and 2.87/1.68 at 256 — smaller
# bins halve the phase-B gather bytes now that selection is one cheap top_k;
# below 64 the curve flattens (32 ~ ties 64)
_BINNED_BIN_SIZE = 64
_BINNED_MARGIN = 2


def _binned_rescore(queries, candidates, bin_idx, bin_size, interpret=False):
    """Phase-B rescore as a Pallas kernel: (B, D) queries, (Cp, D) candidates
    in HBM, (B, kb) selected bin indices → (B, kb*bin_size) f32 pool scores.

    The XLA route (``jnp.take`` + einsum) materializes the (B, kb, bs, D)
    gather — a ~400 MB HBM round-trip at serving scale (B=256, kb=12, fp32),
    measured ~1.09 ms of the old 3.8 ms total. This kernel streams each
    selected bin HBM→VMEM exactly once (double-buffered DMA) and dots it with
    the query row in place: traffic = B·kb·bs·D·itemsize READ only (~200 MB
    fp32, ~100 MB bf16).

    Requires ``bin_size`` rows 8-aligned (bin_size % 8 == 0) and lane-aligned
    width (D % 128 == 0) for the dynamic DMA slices (Mosaic tiling proofs).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, D = queries.shape
    kb = bin_idx.shape[1]
    n_buf = 2
    RB = 8  # query rows per program: every in-kernel store gets STATIC
    # indices into the (RB, kb*bs) output block — Mosaic rejects single-row
    # stores at dynamic row offsets ("dynamic store with unaligned indices")
    # and (1, D) row BlockSpecs (sublane divisibility), both hit before this
    pad_b = (-B) % RB
    qp = jnp.pad(queries.astype(jnp.float32), ((0, pad_b), (0, 0)))
    idxp = jnp.pad(bin_idx.astype(jnp.int32), ((0, pad_b), (0, 0)))
    Bp = qp.shape[0]

    def kernel(idx_ref, q_ref, cand_ref, out_ref, bufs, sems):
        i = pl.program_id(0)

        def dma(t):  # t enumerates (row-in-block, bin) pairs
            rr, j = divmod(t, kb)
            slot = t % n_buf
            return pltpu.make_async_copy(
                cand_ref.at[pl.ds(idx_ref[i * RB + rr, j] * bin_size, bin_size)],
                bufs.at[slot],
                sems.at[slot],
            )

        dma(0).start()
        for t in range(RB * kb):  # static unroll (~96 tiny iterations)
            rr, j = divmod(t, kb)
            if t + 1 < RB * kb:
                dma(t + 1).start()
            dma(t).wait()
            scores = jnp.dot(
                bufs[t % n_buf].astype(jnp.float32),
                q_ref[rr, :],
                preferred_element_type=jnp.float32,
            )
            out_ref[rr, j * bin_size:(j + 1) * bin_size] = scores

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # bin_idx
        grid=(Bp // RB,),
        in_specs=[
            pl.BlockSpec((RB, D), lambda i, *_: (i, 0)),     # query block
            pl.BlockSpec(memory_space=pltpu.ANY),            # candidates in HBM
        ],
        out_specs=pl.BlockSpec((RB, kb * bin_size), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_buf, bin_size, D), candidates.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, kb * bin_size), jnp.float32),
        interpret=interpret,
    )(idxp, qp, candidates)
    return out[:B]


def binned_topk(
    queries: jnp.ndarray,
    candidates: jnp.ndarray,
    k: int,
    ids: Optional[jnp.ndarray] = None,
    bin_size: int = _BINNED_BIN_SIZE,
    bin_margin: int = _BINNED_MARGIN,
    phase_a_precision=None,
    n_valid: Optional[int] = None,
    pallas_rescore: Optional[bool] = None,
    col_scale: Optional[jnp.ndarray] = None,
    col_scale_per_bin: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Provably-exact two-phase top-k at near-matmul speed (phase A pure XLA;
    phase B's rescore optionally a Pallas gather-dot kernel on TPU).

    Phase A: score all candidates, reduce each ``bin_size``-column bin to its
    max. THE fusion-critical rule, measured on v5e (r5): the traced function
    must consume the candidate matrix EXACTLY ONCE — the (L, bs, D) reshape is
    a free bitcast with a single consumer, but any second consumer (even a
    64-row tail slice, a gather, or an in-trace pad) forces XLA to materialize
    the reshape as a full copy: +1.4 ms at 1M x 128 fp32, regardless of how
    small the second use is. Hence ``n_valid``: pad the candidate matrix to a
    bin multiple ONCE at index-build time (outside the trace) and pass the
    real row count here — padding columns are masked in the tiny (B, kb*bs)
    pool, never in the stream.

    Phase B: pick the top-(k+margin) *bins* per row with ``lax.top_k``
    (measured 0.06 ms over (256, 7812) on v5e — 10x cheaper than the r2
    two-level max-extract rounds, whose ~24 small kernels were kernel-count
    bound at ~25 us each), then gather just those bins' rows and rescore
    (k*bin_size columns ~ 0.1-1%% of the catalog); final rank is one more
    ``lax.top_k`` (same lowest-index tie semantics as the reference's
    ``tf.math.top_k``).

    Exactness: every element strictly greater than the true k-th score θ lives
    in a bin whose max exceeds θ, and at most k-1 bins do — so all such bins
    rank in the top-k bins by max; the selected pool also holds ≥ k elements
    ≥ θ (one per selected bin). The proof holds when phase A and phase B score
    identically; on TPU both run at DEFAULT matmul precision (bf16 multiply,
    f32 accumulate) but through differently-shaped einsums, so accumulation
    order can differ by ~1 ulp — ``bin_margin`` extra bins absorb that (the
    margin is a measured buffer, not part of the proof). When ``n_valid``
    masks padding, one extra margin bin absorbs the (single) pad-inflated bin.
    ``phase_a_precision``: pass ``jax.lax.Precision.HIGHEST`` to run phase A's
    scoring in full f32 (≈2-3x phase-A cost) when bitwise-robust selection
    against adversarial near-tie catalogs matters more than speed. Note the
    RETURNED scores are the rescore einsum's values: on TPU at DEFAULT matmul
    precision any two differently-shaped scorings round differently (~0.03
    absolute at D=128 unit-normal data), so candidates whose true scores sit
    within that noise of the k-th threshold can swap with a naive
    ``q @ C.T`` ranking (chip-measured: 5%% of ids at k=10, every mismatch
    within 0.035 of the boundary) — inherent to bf16-multiply scoring, same
    for the reference's fp32-on-GPU vs any TPU DEFAULT implementation.

    A non-multiple-of-bin candidate matrix WITHOUT ``n_valid`` still works
    (legacy tail path) but pays the second-consumer copy — pad at build time.

    ``col_scale``: per-candidate dequantization scale (C,) f32 for an int8
    index. The queries are themselves row-quantized to int8 on the fly (a tiny
    (B, D) op), so both phases run int8×int8 dots on the MXU (≈2× bf16 MXU
    throughput on v5e) over a 1-byte/element catalog stream (4× less HBM than
    fp32), then dequantize in the epilogue: ``score = (qi · ci) * qscale_b *
    cscale_c``. Integer dots are EXACT, so phase A and phase B agree bitwise
    and the bin-max proof holds w.r.t. the quantized scoring function with no
    ulp caveat. Accuracy vs the fp32 index is the two symmetric
    round-to-127-levels errors (recall measured in tests).

    ``col_scale_per_bin=True`` asserts col_scale is CONSTANT within each
    ``bin_size`` block (the bin-quantized index ``BruteForce.index(dtype=int8)``
    builds: rows norm-sorted so each bin shares one scale). This is the fast
    int8 form: a positive per-bin constant commutes with the per-bin max, so
    phase A stays int32 END-TO-END inside the conv+reduce output fusion and
    the dequant touches only the tiny (B, L) bin-max matrix. HLO-verified on
    v5e: the per-COLUMN dequant form forces XLA to materialize the full
    (B, L, bin_size) f32 tensor (1 GB at 1M x 128, B=256 — slower than bf16);
    the per-bin form has the exact fusion structure of the fp32 kernel.
    """
    B, D = queries.shape
    C = candidates.shape[0]
    if ids is not None:
        ids = ids.astype(jnp.int32)
    if col_scale is not None:
        col_scale = col_scale.astype(jnp.float32)
    is_int = jnp.issubdtype(candidates.dtype, jnp.integer)
    q_scale = None
    if is_int:
        # quantize the queries the same way the index was built: the dots
        # become int8 x int8 -> int32 (MXU-native), dequantized in the epilogue
        q_amax = jnp.max(jnp.abs(queries.astype(jnp.float32)), axis=1)
        q_scale = jnp.where(q_amax > 0, q_amax, 1.0) / 127.0  # (B,)
        queries = jnp.clip(
            jnp.round(queries.astype(jnp.float32) / q_scale[:, None]), -127, 127
        ).astype(candidates.dtype)
    if is_int and col_scale is None:
        col_scale = jnp.ones((C,), jnp.float32)
        col_scale_per_bin = True  # constant scales are trivially bin-constant
    acc_dt = jnp.int32 if is_int else jnp.float32

    def _dequant(int_or_f32_scores, cand_scales):
        # candidate-scale dequant ONLY: q_scale is a POSITIVE per-row scalar,
        # so it commutes with every per-row max/top_k in both phases — it is
        # applied ONCE to the final (B, k) scores instead of to the huge
        # (B, L, bs) phase-A tensor (saves a full-size elementwise pass)
        s = int_or_f32_scores.astype(jnp.float32)
        if cand_scales is not None:
            s = s * cand_scales
        return s

    def _apply_q(final_scores):
        if q_scale is None:
            return final_scores
        return final_scores * q_scale[:, None]

    L = C // bin_size  # number of full bins
    r = C - L * bin_size  # tail columns (0 <= r < bin_size)
    if L <= k:
        scores = _dequant(
            jnp.matmul(queries, candidates.T, preferred_element_type=acc_dt),
            None if col_scale is None else col_scale[None, :],
        )
        if n_valid is not None and n_valid < C:
            scores = jnp.where(
                jnp.arange(C, dtype=jnp.int32)[None, :] < n_valid, scores, NEG_INF
            )
        s, pos = jax.lax.top_k(scores, min(k, C))
        s = _apply_q(s)
        pos = pos.astype(jnp.int32)
        if ids is None:
            return s, pos
        return s, jnp.take(ids, pos)

    # Phase A: fused matmul -> per-bin max over the full bins. c3 must be the
    # ONLY consumer of `candidates` in this trace (see docstring). For an int8
    # index the dot is int8 x int8 -> int32 on the MXU; the dequant multiplies
    # fuse into the epilogue before the bin max.
    c3 = candidates[: L * bin_size].reshape(L, bin_size, D)
    sc_bin = None
    if col_scale is not None and col_scale_per_bin:
        sc_bin = col_scale[: L * bin_size].reshape(L, bin_size)[:, 0]  # (L,)
    s_bls_raw = jnp.einsum(
        "bd,lsd->bls", queries, c3,
        preferred_element_type=acc_dt, precision=phase_a_precision,
    )
    if sc_bin is not None:
        # per-bin scale commutes with the bin max: reduce in int32 INSIDE the
        # conv fusion, dequantize the tiny (B, L) result
        bin_max = jnp.max(s_bls_raw, axis=2).astype(jnp.float32) * sc_bin[None, :]
    else:
        s_bls = _dequant(
            s_bls_raw,
            None if col_scale is None
            else col_scale[: L * bin_size].reshape(1, L, bin_size),
        )
        bin_max = jnp.max(s_bls, axis=2)  # (B, L)

    # one extra margin bin when padding may inflate the final bin's max
    mask_pad = n_valid is not None and n_valid < L * bin_size
    kb = min(k + bin_margin + (1 if mask_pad else 0), L)
    _, bin_idx = jax.lax.top_k(bin_max, kb)  # (B, kb)
    bin_idx = bin_idx.astype(jnp.int32)

    # gather the selected bins and rescore. The Pallas kernel is available
    # but OFF by default: chip-measured (r5, 1M x 128, B=256) it ties XLA at
    # fp32 (1.90 vs 1.93 ms total) and LOSES at bf16 (1.64 vs 1.02) — the
    # per-(row, bin) DMA chains don't beat XLA's batched gather even though
    # the gather round-trips 2x the bytes.
    use_pallas_b = (
        bool(pallas_rescore) and D % 128 == 0 and bin_size % 8 == 0 and not is_int
    )
    if use_pallas_b:
        # streams each selected bin HBM->VMEM once; the XLA gather below
        # round-trips the whole (B, kb, bs, D) gather through HBM
        pool_s = _binned_rescore(
            queries, candidates[: L * bin_size], bin_idx, bin_size
        )
    else:
        gathered = jnp.take(c3, bin_idx, axis=0)  # (B, kb, bs, D) — int8 stays int8
        pool_s = jnp.einsum(
            "bd,bksd->bks", queries, gathered, preferred_element_type=acc_dt,
        ).reshape(B, kb * bin_size)
    if col_scale is not None:
        if sc_bin is not None:
            csel = jnp.broadcast_to(
                jnp.take(sc_bin, bin_idx, axis=0)[:, :, None], (B, kb, bin_size)
            ).reshape(B, kb * bin_size)
        else:
            sc3 = col_scale[: L * bin_size].reshape(L, bin_size)
            csel = jnp.take(sc3, bin_idx, axis=0).reshape(B, kb * bin_size)
        pool_s = _dequant(pool_s, csel)
    elif is_int:
        pool_s = pool_s.astype(jnp.float32)
    cols = (
        bin_idx[:, :, None] * bin_size
        + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bin_size), 2)
    ).reshape(B, kb * bin_size)
    if mask_pad:
        pool_s = jnp.where(cols < n_valid, pool_s, NEG_INF)
    if r:
        # legacy tail: exact but pays the second-consumer copy (docstring)
        tail = candidates[L * bin_size :]  # (r, D) static slice
        s_tail = _dequant(
            jnp.matmul(queries, tail.T, preferred_element_type=acc_dt),
            None if col_scale is None else col_scale[None, L * bin_size :],
        )
        if n_valid is not None and n_valid < C:
            s_tail = jnp.where(
                (L * bin_size + jnp.arange(r, dtype=jnp.int32))[None, :] < n_valid,
                s_tail, NEG_INF,
            )
        pool_s = jnp.concatenate([pool_s, s_tail], axis=1)
        tail_cols = jnp.broadcast_to(
            L * bin_size + jnp.arange(r, dtype=jnp.int32)[None, :], (B, r)
        )
        cols = jnp.concatenate([cols, tail_cols], axis=1)
    top_s, top_p = jax.lax.top_k(pool_s, k)
    top_s = _apply_q(top_s)
    top_cols = jnp.take_along_axis(cols, top_p.astype(jnp.int32), axis=1)
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
    n_valid: Optional[int] = None,
    col_scale: Optional[jnp.ndarray] = None,
    col_scale_per_bin: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch: binned two-phase (fastest, exact, pure XLA) when the bin pool
    fits comfortably; Pallas streaming kernel or blockwise scan for very large
    query batches (their memory is O(B·k) regardless of B). Small catalogs
    (≤ one tile) use the direct matmul+top_k (XLA fuses it fine at that size).

    ``method``: 'auto' | 'binned' | 'pallas' | 'blockwise'.
    ``n_valid``: real row count when ``candidates`` was padded at index-build
    time (see :func:`binned_topk`); non-binned methods slice the padding off.
    ``col_scale``: per-candidate f32 dequantization scales (int8 index).
    """
    C = candidates.shape[0]
    padded = n_valid is not None and n_valid < C
    if method == "auto" and C <= tile:
        cand = candidates
        if jnp.issubdtype(cand.dtype, jnp.integer):
            cand = cand.astype(queries.dtype)
        scores = jnp.matmul(queries, cand.T, preferred_element_type=jnp.float32)
        if col_scale is not None:
            scores = scores * col_scale.astype(jnp.float32)[None, :]
        if padded:
            scores = jnp.where(
                jnp.arange(C, dtype=jnp.int32)[None, :] < n_valid, scores, NEG_INF
            )
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
        return binned_topk(
            queries, candidates, k, ids=ids, n_valid=n_valid, col_scale=col_scale,
            col_scale_per_bin=col_scale_per_bin,
        )
    if padded:
        # streaming kernels score every row: drop the padding instead
        candidates = candidates[:n_valid]
        if ids is not None:
            ids = ids[:n_valid]
        if col_scale is not None:
            col_scale = col_scale[:n_valid]
    if (method == "pallas" or (method == "auto" and on_tpu)) and col_scale is None:
        try:
            return pallas_topk(queries, candidates, k, ids=ids, tile=min(tile, 4096))
        except Exception:  # Mosaic lowering gap → fall back
            if explicit and method == "pallas":
                raise
    return blockwise_topk(queries, candidates, k, ids=ids, tile=tile, col_scale=col_scale)


def sharded_topk(
    queries: jnp.ndarray,
    candidates: jnp.ndarray,
    k: int,
    mesh,
    axis: str = "model",
    ids: Optional[jnp.ndarray] = None,
    tile: int = 4096,
    col_scale: Optional[jnp.ndarray] = None,
    col_scale_per_bin: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k over a row-sharded candidate matrix.

    Each device scans its candidate rows (queries replicated), then the per-shard
    (B, k) partial lists are all-gathered over ``axis`` and merged — the k-list
    (tiny) rides ICI instead of the full score matrix. This is the multi-chip
    BASELINE.json north-star query path. ``col_scale``: per-candidate f32
    dequantization scales (int8 index), row-sharded like the candidates.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard_map = jax.shard_map

    C, D = candidates.shape
    n_shards = mesh.shape[axis]
    if ids is None:
        ids = jnp.arange(C, dtype=jnp.int32)

    def local_topk(q, cand_shard, id_shard, *rest):
        scale_shard = rest[0] if rest else None
        if cand_shard.shape[0] // 128 > k:
            # binned two-phase kernel (pure XLA — composes with shard_map);
            # per-bin scales stay valid per shard only when the shard length
            # is a bin multiple — the caller guarantees that or passes False
            s, i = binned_topk(q, cand_shard, k, ids=id_shard,
                               col_scale=scale_shard,
                               col_scale_per_bin=col_scale_per_bin)
        else:
            s, i = blockwise_topk(
                q, cand_shard, k, ids=id_shard, tile=min(tile, cand_shard.shape[0]),
                col_scale=scale_shard, _pvary_axis=axis,
            )
        # gather partial lists from every shard and merge
        all_s = jax.lax.all_gather(s, axis)  # (n_shards, B, k)
        all_i = jax.lax.all_gather(i, axis)
        all_s = jnp.moveaxis(all_s, 0, 1).reshape(q.shape[0], n_shards * k)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(q.shape[0], n_shards * k)
        best_s, idx = jax.lax.top_k(all_s, k)
        best_i = jnp.take_along_axis(all_i, idx, axis=1)
        return best_s, best_i

    in_specs = (P(), P(axis, None), P(axis))
    args = (queries, candidates, ids)
    if col_scale is not None:
        in_specs = in_specs + (P(axis),)
        args = args + (col_scale,)
    fn = shard_map(
        local_topk,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        # the all_gather+merge makes outputs bitwise-identical on every shard,
        # but the varying-axis checker can't infer that
        check_vma=False,
    )
    return fn(*args)
