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


def _xla_scatter_write(table, ids, rows, valid):
    R = table.shape[0]
    # invalid positions write out-of-bounds and get dropped — duplicate ids
    # among padding can never race a valid write
    safe = jnp.where(valid, ids, R)
    return table.at[safe].set(rows.astype(table.dtype), mode="drop")


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
    in-place pipeline, no read phase): used by the stochastic-rounding update
    for low-precision tables, where the new row value is computed in float32
    and must REPLACE the old one (adding a rounded delta to a rounded base
    would double-round). HBM traffic ~ B x D x itemsize, independent of R."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = ids.shape[0]
    R, D = table.shape
    if valid is None:
        valid = jnp.ones((B,), bool)
    rows = rows.astype(table.dtype)
    if force_xla or (not interpret and jax.default_backend() != "tpu"):
        return _xla_scatter_write(table, ids, rows, valid)

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

    def kernel(ids_ref, valid_ref, rows_ref, tbl_in_ref, out_ref, dummy_ref, wbuf, wsem):
        del tbl_in_ref  # aliased with out_ref
        base = pl.program_id(0) * block

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

        def body(j, _):
            slot = j % n_buf

            # retire the write that last used wbuf[slot]
            @pl.when(j >= n_buf)
            def _():
                write_op(j - n_buf, lambda c: c.wait())

            wbuf[slot, :] = rows_ref[j, :]
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
            pl.BlockSpec((block, D), lambda b, *_: (b, 0)),  # rows: VMEM per block
            pl.BlockSpec(memory_space=pltpu.ANY),            # table stays in HBM
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),            # table (aliased)
            pl.BlockSpec(memory_space=pltpu.ANY),            # dummy write target
        ),
        scratch_shapes=[
            pltpu.VMEM((n_buf, D), table.dtype),
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
