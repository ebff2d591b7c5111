"""Row-scatter kernel: the missing piece that makes row-sparse embedding
optimizers win on TPU.

XLA lowers ``table.at[ids].add(rows)`` on this TPU to serialized row updates
(~21s for 8k rows into a 162k×128 table — see CLAUDE.md), so the LazyAdam-style
sparse path (reference ``tf/blocks/optimizer.py:342``) was a pessimization.
This module provides:

- :func:`dedup_rows` — sort ids + segment-sum duplicate rows (static shapes),
  so every valid scatter target is unique. This also matches dense-gradient
  semantics exactly (duplicates accumulate before the optimizer update).
- :func:`pallas_row_scatter_add` — a Pallas kernel that read-modify-writes only
  the touched HBM rows via pipelined async DMA (reads run ``n_buf`` ahead of
  the compute front; valid rows are unique so RMW hazards cannot alias).

On non-TPU backends the function falls back to XLA scatter (fast on CPU).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def dedup_rows(ids: jnp.ndarray, rows: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(ids (B,), rows (B, D)) -> (sorted_ids, summed_rows, is_run_start).

    Duplicate ids are segment-summed into the first occurrence (run start);
    non-start positions carry stale data and must be masked by ``valid``.
    All shapes stay static (no ``jnp.unique``).
    """
    B = ids.shape[0]
    order = jnp.argsort(ids)
    sids = jnp.take(ids, order)
    srows = jnp.take(rows, order, axis=0)
    start = jnp.concatenate([jnp.ones((1,), bool), sids[1:] != sids[:-1]])
    seg = jnp.cumsum(start) - 1
    summed = jax.ops.segment_sum(srows, seg, num_segments=B)
    return sids, jnp.take(summed, seg, axis=0), start


def _xla_scatter_add(table, ids, updates, valid):
    upd = jnp.where(valid[:, None], updates, 0.0)
    return table.at[ids].add(upd, mode="drop")


def stochastic_round(x: jnp.ndarray, key, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Round float32 to ``dtype`` stochastically: P(round up) equals the
    fractional distance to the upper representable neighbour, so rounding is
    unbiased in expectation. This is what makes low-precision embedding-table
    TRAINING work — round-to-nearest silently drops updates smaller than half
    a ulp of the (large) running value, stalling learning; stochastic rounding
    applies them with proportional probability (the standard production
    technique for bf16 recommender tables on TPU).

    Implementation: add uniform noise to the mantissa bits that truncation
    will discard, then truncate — exact for values already representable."""
    if jnp.dtype(dtype) != jnp.bfloat16:
        raise NotImplementedError("stochastic_round targets bfloat16")
    x = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    noise = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    rounded = (bits + noise) & jnp.uint32(0xFFFF0000)
    out = jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(jnp.bfloat16)
    # inf/NaN bit patterns + mantissa noise would land in (different) NaN
    # space: pass non-finite values through round-to-nearest instead
    return jnp.where(jnp.isfinite(x), out, x.astype(jnp.bfloat16))


def _scatter_write_block(table, ids, rows, valid, block, n_buf, interpret=False):
    """Row-scatter-write via aligned 8-row block RMW — the route for 16-bit
    tables with lane-aligned rows (D % 128 == 0), which the single-row DMA
    kernel cannot address. Narrow rows (D % 128 != 0, e.g. criteo's native
    D=64) CANNOT come here: Mosaic's lane tiling rejects (8, 64) slices too
    ("Slice shape along dimension 1 must be aligned to tiling (128)",
    chip-verified on v5e) — they route through XLA scatter with
    unique_indices instead (see pallas_row_scatter_write).

    Mosaic rejects dynamic single-row DMA slices of 16-bit arrays ("Slice
    shape along dimension 0 must be aligned to tiling (8)", v5e), and routing
    through an XLA-level uint32 pair view of the full table is a dead end: the
    rank-3 bitcast intermediate materializes with a 64x lane-padded layout
    (measured on the AOT compiler — a 16Mx128 bf16 table tried to allocate
    524GB: ``u32[8M,128,2]{2,1,0:T(8,128)}``). What the chip DOES accept for
    any dtype is an (8, D) slice at a provably 8-aligned dynamic offset
    (chip-validated), so:

    1. group writes by 8-row block; one writer (leader) per touched block,
       duplicate-block updates merged BEFORE the kernel so in-flight DMAs
       never alias;
    2. compose each touched block's content in plain vectorized XLA — all
       entries of a block are CONTIGUOUS after the sort, so each leader's
       block is assembled from its 8-entry forward window with a (8 entries x
       8 block-rows) match matrix contracted against the window's rows (an
       exact 0/1 einsum; ``jnp.searchsorted`` would be the obvious tool but
       XLA lowers it to a ~13-step while loop of gathers costing 6.8 ms/step
       at B=8192 on v5e — measured; the window einsum is ~0.1 ms);
    3. DMA whole aligned (8, D) blocks. HBM traffic <= 8x B rows each way,
       independent of R (~16 MB at B=8192, D=128 bf16).
    """
    B = ids.shape[0]
    R, D = table.shape
    imax = jnp.int32(2**31 - 1)
    key = jnp.where(valid, ids.astype(jnp.int32), imax)
    order = jnp.argsort(key)
    sid = jnp.take(key, order)
    srow = jnp.take(rows, order, axis=0).astype(table.dtype)
    svalid = sid != imax
    q = sid >> 3
    lead = svalid & jnp.concatenate([jnp.ones((1,), bool), q[1:] != q[:-1]])
    targets = q[:, None] * 8 + jnp.arange(8, dtype=sid.dtype)[None, :]  # (B, 8)
    # a block holds <= 8 rows, so a leader's block entries live in sorted
    # positions [j, j+8); gather the window and match ids against the block's
    # 8 target ids (valid ids are unique -> at most one match per column)
    raw_win = jnp.arange(B)[:, None] + jnp.arange(8)[None, :]
    win = jnp.clip(raw_win, 0, B - 1)
    wsid = jnp.take(sid, win.reshape(-1)).reshape(B, 8)
    wrow = jnp.take(srow, win.reshape(-1), axis=0).reshape(B, 8, D)
    match = wsid[:, :, None] == targets[:, None, :]  # (B, win, row)
    # clipped (out-of-range) window slots alias entry B-1 — mask them so a
    # tail id can't match (and sum) multiple times
    match = match & (raw_win < B)[:, :, None]
    present = match.any(axis=1)
    new = jnp.einsum(
        "bkr,bkd->brd", match.astype(table.dtype), wrow,
        preferred_element_type=table.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )  # exact: 0/1 weights select at most one row per output slot; HIGHEST
    # keeps fp32 operands fp32 on TPU (DEFAULT would bf16-round every row
    # written through this path — ADVICE r4). Cost negligible: (B,8,8,D).
    old = jnp.take(table, targets.reshape(-1), axis=0, mode="clip").reshape(B, 8, D)
    merged = jnp.where(present[:, :, None], new, old).astype(table.dtype)
    return _block_write_kernel(
        table, q, merged.reshape(B * 8, D), lead, block, n_buf, interpret
    )


def _block_write_kernel(table, q, blocks8, lead, block, n_buf, interpret):
    """DMA aligned (8, D) row blocks: ``table[8q[j]:8q[j]+8] = blocks8[8j:8j+8]``
    for every leading j, with ``n_buf`` copies in flight (non-leaders write to
    a per-slot dummy so semaphore starts/waits pair unconditionally)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = q.shape[0]
    R, D = table.shape
    block = min(block, max(n_buf, B))
    pad = (-B) % block
    if pad:
        q = jnp.pad(q, (0, pad))
        blocks8 = jnp.pad(blocks8, ((0, pad * 8), (0, 0)))
        lead = jnp.pad(lead, (0, pad))
    q = q.astype(jnp.int32)
    lmask = lead.astype(jnp.int32)
    n_blocks = q.shape[0] // block
    lo = min(n_buf, block)

    def kernel(q_ref, lead_ref, rows_ref, tbl_in_ref, out_ref, dummy_ref, wsem):
        del tbl_in_ref  # aliased with out_ref
        base = pl.program_id(0) * block

        def write_op(j, action):
            slot = j % n_buf
            src = rows_ref.at[pl.ds(8 * (base + j), 8)]

            @pl.when(lead_ref[base + j] != 0)
            def _():
                action(
                    pltpu.make_async_copy(
                        src, out_ref.at[pl.ds(8 * q_ref[base + j], 8)], wsem.at[slot]
                    )
                )

            @pl.when(lead_ref[base + j] == 0)
            def _():
                action(
                    pltpu.make_async_copy(
                        src, dummy_ref.at[pl.ds(8 * slot, 8)], wsem.at[slot]
                    )
                )

        def body(j, _):
            # retire the copy that last used this semaphore slot
            @pl.when(j >= n_buf)
            def _():
                write_op(j - n_buf, lambda c: c.wait())

            write_op(j, lambda c: c.start())
            return ()

        jax.lax.fori_loop(0, block, body, ())

        for k in range(lo):
            write_op(block - lo + k, lambda c: c.wait())

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # block ids, leader mask
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),            # merged blocks in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),            # table stays in HBM
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),            # table (aliased)
            pl.BlockSpec(memory_space=pltpu.ANY),            # dummy write target
        ),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
    )
    out, _ = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((R, D), table.dtype),
            jax.ShapeDtypeStruct((8 * n_buf, D), table.dtype),
        ),
        input_output_aliases={3: 0},  # operand order: q, lead, blocks, table
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(q, lmask, blocks8, table)
    return out


def _xla_scatter_write(table, ids, rows, valid):
    R = table.shape[0]
    B = ids.shape[0]
    # invalid positions write out-of-bounds and get dropped. Distinct OOB
    # slots (R+j) keep the index vector globally unique, so unique_indices
    # is honest and XLA parallelizes the scatter instead of serializing it
    # (measured on v5e: 0.57 ms for 8192 rows into 523k x 64 — the route for
    # every D % 128 != 0 table, where Mosaic rejects ALL dynamic DMA slices:
    # lane-dim tiling requires multiples of 128, so even aligned (8, 64)
    # blocks fail "Slice shape along dimension 1 must be aligned to tiling").
    safe = jnp.where(valid, ids, R + jnp.arange(B, dtype=ids.dtype))
    return table.at[safe].set(
        rows.astype(table.dtype), mode="drop", unique_indices=True
    )


def pallas_row_scatter_write(
    table: jnp.ndarray,    # (R, D)
    ids: jnp.ndarray,      # (B,) int32 — valid positions must target UNIQUE rows
    rows: jnp.ndarray,     # (B, D) final row values (already in table dtype)
    valid: Optional[jnp.ndarray] = None,
    block: int = 2048,
    n_buf: int = 8,
    interpret: bool = False,
    force_xla: bool = False,
) -> jnp.ndarray:
    """``table[ids[j]] = rows[j]`` for every valid j; returns the table.

    The write-mode sibling of :func:`pallas_row_scatter_add` (same donated
    in-place table, no read phase): used by the stochastic-rounding update
    for low-precision tables, where the new row value is computed in float32
    and must REPLACE the old one (adding a rounded delta to a rounded base
    would double-round). HBM traffic ~ B x D x itemsize, independent of R.

    Unlike the add kernel, nothing here touches row data with the VPU: each
    valid row is ONE direct HBM->HBM async copy ``rows[j] -> table[ids[j]]``
    with ``n_buf`` copies in flight. 32-bit 128-lane-aligned rows DMA singly;
    16-bit tables and tables with ``D % 128 != 0`` (criteo-style D=64) route
    through :func:`_scatter_write_block` (Mosaic requires 8-row-aligned,
    lane-aligned slices — single-row descriptors fail the tiling-alignment
    proof on the real chip)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = ids.shape[0]
    R, D = table.shape
    if valid is None:
        valid = jnp.ones((B,), bool)
    rows = rows.astype(table.dtype)
    if force_xla or (not interpret and jax.default_backend() != "tpu"):
        return _xla_scatter_write(table, ids, rows, valid)
    if D % 128:
        # No Pallas route exists for narrow rows: Mosaic's lane tiling
        # rejects every dynamic slice whose last dim isn't a multiple of 128
        # (chip-verified: aligned (8, 64) blocks fail compile on v5e), and a
        # pair-packed (R/2, 128) view of the table through the block kernel
        # measured 1.58 ms vs 0.57 ms for XLA scatter with unique_indices
        # (8192 rows, 523k x 64). XLA with a globally-unique index vector is
        # the fastest correct route.
        return _xla_scatter_write(table, ids, rows, valid)
    if jnp.dtype(table.dtype).itemsize == 2:
        if R % 8:
            return _xla_scatter_write(table, ids, rows, valid)
        return _scatter_write_block(
            table, ids, rows, valid, block, n_buf, interpret=interpret
        )

    block = min(block, max(n_buf, B))
    pad = (-B) % block
    if pad:
        ids = jnp.pad(ids, (0, pad))
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    ids = ids.astype(jnp.int32)
    vmask = valid.astype(jnp.int32)
    n_blocks = ids.shape[0] // block
    lo = min(n_buf, block)

    def kernel(ids_ref, valid_ref, rows_ref, tbl_in_ref, out_ref, dummy_ref, wsem):
        del tbl_in_ref  # aliased with out_ref
        base = pl.program_id(0) * block

        def write_op(j, action):
            slot = j % n_buf

            @pl.when(valid_ref[base + j] != 0)
            def _():
                action(
                    pltpu.make_async_copy(
                        rows_ref.at[base + j], out_ref.at[ids_ref[base + j]], wsem.at[slot]
                    )
                )

            @pl.when(valid_ref[base + j] == 0)
            def _():
                action(
                    pltpu.make_async_copy(
                        rows_ref.at[base + j], dummy_ref.at[0], wsem.at[slot]
                    )
                )

        def body(j, _):
            # retire the copy that last used this semaphore slot
            @pl.when(j >= n_buf)
            def _():
                write_op(j - n_buf, lambda c: c.wait())

            write_op(j, lambda c: c.start())
            return ()

        jax.lax.fori_loop(0, block, body, ())

        # epilogue: retire the last writes before the block ends
        for k in range(lo):
            write_op(block - lo + k, lambda c: c.wait())

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ids, valid
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),            # rows stay in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),            # table stays in HBM
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),            # table (aliased)
            pl.BlockSpec(memory_space=pltpu.ANY),            # dummy write target
        ),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
    )
    out, _ = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((R, D), table.dtype),
            jax.ShapeDtypeStruct((1, D), table.dtype),
        ),
        input_output_aliases={3: 0},  # operand order: ids, valid, rows, table
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(ids, vmask, rows, table)
    return out


def pallas_row_scatter_add(
    table: jnp.ndarray,    # (R, D)
    ids: jnp.ndarray,      # (B,) int32 — valid positions must target UNIQUE rows
    updates: jnp.ndarray,  # (B, D)
    valid: Optional[jnp.ndarray] = None,  # (B,) bool; None = all valid
    block: int = 2048,
    n_buf: int = 8,
    interpret: bool = False,
    force_xla: bool = False,
) -> jnp.ndarray:
    """``table[ids[j]] += updates[j]`` for every valid j; returns the table.

    The table buffer is donated (input/output aliased): inside jit this is a
    true in-place update — HBM traffic is ~2×B×D×4 bytes, independent of R.
    Valid positions MUST target distinct rows (use :func:`dedup_rows`).

    Pipeline discipline: every iteration starts exactly one read and one write
    (invalid rows write their garbage to a per-slot dummy buffer instead of the
    table), so semaphore starts/waits pair unconditionally — no slot can reach
    reuse with an unretired DMA.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = ids.shape[0]
    R, D = table.shape
    if valid is None:
        valid = jnp.ones((B,), bool)
    if force_xla or (not interpret and jax.default_backend() != "tpu"):
        return _xla_scatter_add(table, ids, updates, valid)
    if table.dtype == jnp.float32 and D % 128:
        # Narrow fp32 rows (criteo-style D=64): no Pallas route compiles
        # (Mosaic lane tiling — see pallas_row_scatter_write), and a direct
        # XLA scatter-add with a unique index vector is fast (0.62-0.79 ms
        # for 8192 rows into 523k x 64 on v5e) and exact in fp32. Invalid
        # positions carry duplicate run-ids after dedup — remap them to
        # distinct OOB slots so unique_indices stays honest.
        safe = jnp.where(valid, ids, R + jnp.arange(B, dtype=ids.dtype))
        return table.at[safe].add(updates, mode="drop", unique_indices=True)
    if table.dtype != jnp.float32:
        # Mosaic rejects dynamic-row VPU loads/stores on sub-fp32 VMEM buffers
        # (bf16 tiling is (16, 128)), so the RMW pipeline below is fp32-D128
        # only. Low-precision tables read the old rows with an XLA gather
        # (fast) and REPLACE them via the write route — identical semantics
        # since valid rows are unique; round-to-nearest at the final cast;
        # callers that need unbiased accumulation should use stochastic_round
        # + pallas_row_scatter_write directly (see blocks/optimizer._commit_rows).
        # invalid lanes may carry arbitrary ids: clip explicitly rather than
        # relying on jnp.take's implicit out-of-bounds behavior (ADVICE r3)
        old = jnp.take(table, ids, axis=0, mode="clip").astype(jnp.float32)
        new_rows = (old + updates.astype(jnp.float32)).astype(table.dtype)
        return pallas_row_scatter_write(
            table, ids, new_rows, valid, block=block, n_buf=n_buf,
            interpret=interpret,
        )

    block = min(block, max(n_buf, B))
    pad = (-B) % block
    if pad:
        ids = jnp.pad(ids, (0, pad))
        updates = jnp.pad(updates, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    ids = ids.astype(jnp.int32)
    vmask = valid.astype(jnp.int32)
    n_blocks = ids.shape[0] // block
    lo = min(n_buf, block)

    def kernel(ids_ref, valid_ref, upd_ref, tbl_in_ref, out_ref, dummy_ref, rbuf, wbuf, rsem, wsem):
        del tbl_in_ref  # aliased with out_ref
        base = pl.program_id(0) * block

        def read_copy(j):
            return pltpu.make_async_copy(
                out_ref.at[ids_ref[base + j]], rbuf.at[j % n_buf], rsem.at[j % n_buf]
            )

        def write_op(j, action):
            slot = j % n_buf

            @pl.when(valid_ref[base + j] != 0)
            def _():
                action(
                    pltpu.make_async_copy(
                        wbuf.at[slot], out_ref.at[ids_ref[base + j]], wsem.at[slot]
                    )
                )

            @pl.when(valid_ref[base + j] == 0)
            def _():
                action(
                    pltpu.make_async_copy(wbuf.at[slot], dummy_ref.at[slot], wsem.at[slot])
                )

        # prologue: fill the read pipeline
        for k in range(lo):
            read_copy(k).start()

        def body(j, _):
            slot = j % n_buf

            # retire the write that last used wbuf[slot]
            @pl.when(j >= n_buf)
            def _():
                write_op(j - n_buf, lambda c: c.wait())

            read_copy(j).wait()
            wbuf[slot, :] = rbuf[slot, :] + upd_ref[j, :]
            write_op(j, lambda c: c.start())

            # keep reads running ahead of the compute front
            @pl.when(j + n_buf < block)
            def _():
                read_copy(j + n_buf).start()

            return ()

        jax.lax.fori_loop(0, block, body, ())

        # epilogue: retire the last writes before the block ends
        for k in range(lo):
            write_op(block - lo + k, lambda c: c.wait())

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ids, valid
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, D), lambda b, *_: (b, 0)),  # updates: VMEM per block
            pl.BlockSpec(memory_space=pltpu.ANY),            # table stays in HBM
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),            # table (aliased)
            pl.BlockSpec(memory_space=pltpu.ANY),            # dummy write target
        ),
        scratch_shapes=[
            pltpu.VMEM((n_buf, D), table.dtype),
            pltpu.VMEM((n_buf, D), table.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
    )
    out, _ = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((R, D), table.dtype),
            jax.ShapeDtypeStruct((n_buf, D), table.dtype),
        ),
        input_output_aliases={3: 0},  # operand order: ids, valid, updates, table
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(ids, vmask, updates, table)
    return out
