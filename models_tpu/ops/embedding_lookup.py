"""Embedding lookup ops: Pallas double-buffered gather + mesh-sharded lookups.

SURVEY.md §7 kernel #1 — the TPU answer to SOK's fused all2all lookup
(reference ``tf/distributed/embedding.py:144-233``, ``sok.lookup_sparse``):

- :func:`pallas_gather` — rows stream HBM→VMEM with double-buffered async DMA
  driven by scalar-prefetched ids (PrefetchScalarGridSpec), overlapping row
  fetches with writes. For big tables XLA's dynamic-gather is already decent;
  the kernel exists for the HBM-resident (non-VMEM-fitting) table case and as
  the base of the remote-DMA variant.
- :func:`a2a_lookup` — the designed kernel: each device takes a 1/n slice of
  the id list, buckets its ids by owning shard, ``all_to_all``s the buckets to
  their owners, gathers locally, ``all_to_all``s the rows back and
  ``all_gather``s the assembled slices. Comm over the model axis is ~2·B·D
  activation bytes per lookup and the local gather work is split n ways — no
  device ever touches more than B/n ids and the table never moves.
- :func:`sharded_lookup` — dispatcher: routes to :func:`a2a_lookup` when the
  batch divides the mesh axes, else falls back to the psum assembly (each
  device gathers owned rows zero-filled + one psum).
- :func:`sharded_update_rows` — scatter-add for row-sparse optimizer updates
  on a sharded table (see also ``blocks/optimizer.py`` for the shard-mapped
  Pallas production path).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Pallas gather kernel
# ---------------------------------------------------------------------------

def pallas_gather(
    table: jnp.ndarray,  # (R, D) in HBM
    ids: jnp.ndarray,    # (B,) int32
    block: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Gather rows of an HBM-resident table with pipelined row DMA.

    Each row is ONE direct HBM->HBM async copy ``table[ids[j]] -> out[j]``
    with ``n_buf`` copies in flight — no VPU touches row data. 32-bit dtypes
    copy single rows; 16-bit tables copy the aligned 8-row block containing
    each id and select the row afterwards (Mosaic's tiling-alignment rules,
    see below)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # 16-bit tables: Mosaic rejects dynamic single-row DMA slices (8-row
    # tiling alignment) and the XLA-level uint32 pair view is unusable at
    # scale (the rank-3 bitcast materializes 64x lane-padded — 524GB for a
    # 16Mx128 table, measured on the AOT compiler). The chip-validated form
    # is an 8-row-aligned (8, D) slice, so gather the full aligned block each
    # id lives in and select the wanted row on the VPU (8x read amplification
    # — this kernel targets HBM-resident tables where XLA's gather is the
    # alternative, not a hot forward path). interpret mode takes the SAME
    # branch so the block-select logic is covered off-chip (ADVICE r3).
    itemsize = jnp.dtype(table.dtype).itemsize
    rpi = 8 if itemsize == 2 else 1  # rows per DMA item
    n_buf = 8
    B = ids.shape[0]
    R, D = table.shape
    if rpi > 1 and R % rpi:
        return jnp.take(table, ids, axis=0, mode="clip")
    kids = ids >> 3 if rpi > 1 else ids
    pad = (-B) % block
    ids_p = jnp.pad(kids, (0, pad)) if pad else kids
    n_blocks = ids_p.shape[0] // block
    lo = min(n_buf, block)

    def kernel(ids_ref, table_ref, out_ref, sems):
        base = pl.program_id(0) * block

        def get_dma(j):
            if rpi == 1:
                src = table_ref.at[ids_ref[base + j]]
                dst = out_ref.at[base + j]
            else:
                src = table_ref.at[pl.ds(rpi * ids_ref[base + j], rpi)]
                dst = out_ref.at[pl.ds(rpi * (base + j), rpi)]
            return pltpu.make_async_copy(src, dst, sems.at[j % n_buf])

        def body(j, _):
            @pl.when(j >= n_buf)
            def _():
                get_dma(j - n_buf).wait()

            get_dma(j).start()
            return ()

        jax.lax.fori_loop(0, block, body, ())
        for k in range(lo):
            get_dma(block - lo + k).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],   # table stays in HBM
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),    # rows land in HBM
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ids_p.shape[0] * rpi, D), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(ids_p, table)
    if rpi == 1:
        return out[:B]
    blocks = out[: B * rpi].reshape(B, rpi, D)
    return jnp.take_along_axis(
        blocks, (ids & 7).astype(jnp.int32)[:, None, None], axis=1
    )[:, 0]


# ---------------------------------------------------------------------------
# mesh-sharded lookups
# ---------------------------------------------------------------------------

def a2a_lookup(
    table: jnp.ndarray,  # (R, D) row-sharded over `axis`
    ids: jnp.ndarray,    # (B,) — replicated or sharded over `data_axis`
    mesh,
    axis: str = "model",
    data_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Bucketed all-to-all lookup on a row-sharded table (SOK ``lookup_sparse``
    parity, reference ``tf/distributed/embedding.py:144-233``).

    Per device on the model axis (n shards, local batch B_l, slice S = B_l/n):

    1. take slice ``s`` of the id list (each model-column works a disjoint 1/n
       of the batch instead of redundantly masking the whole batch);
    2. sort the slice's ids by owning shard (``id // rows_per``) and pack them
       into an (n, S) bucket matrix (worst-case capacity S, built with gathers
       — no scatter, which XLA serializes on this TPU);
    3. ``all_to_all`` buckets to their owners; each owner gathers its rows from
       the local shard ((n, S) ids — clip+garbage for padding slots, masked by
       the requester's validity knowledge);
    4. ``all_to_all`` the (n, S, D) rows back, unsort into slice order;
    5. ``all_gather`` the n slices into the (B_l, D) result.

    Comm over the model axis per lookup ≈ B_l ids + B_l·D rows (a2a) +
    (n-1)/n·B_l·D (gather) ≈ 2·B·D activation bytes — independent of table
    size; the gather compute is 1/n per device. The backward pass reverses the
    same route (reduce-scatter ← all_gather, a2a ← a2a) and lands row grads on
    the owning shard only.

    Requires ``B % (dp·n) == 0`` (caller pads) and ``R % n == 0``.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]
    R = table.shape[0]
    if R % n != 0:
        raise ValueError(f"table rows {R} not divisible by mesh axis {axis}={n}")
    rows_per = R // n
    dp = mesh.shape[data_axis] if (data_axis is not None and data_axis in mesh.shape) else 1
    use_data = dp > 1 and ids.shape[0] % dp == 0
    B_l = ids.shape[0] // dp if use_data else ids.shape[0]
    if B_l % n != 0:
        raise ValueError(f"local batch {B_l} not divisible by mesh axis {axis}={n}")
    S = B_l // n
    ids_spec = P(data_axis) if use_data else P()
    out_spec = P(data_axis, None) if use_data else P()

    def local(table_shard, ids_l):
        shard = jax.lax.axis_index(axis)
        # 1. this device's slice of the local batch. Out-of-range ids (padding
        # sentinels, negatives) must contribute ZERO rows — the psum path's
        # documented miss semantics; without the mask they'd bucket to a
        # clamped owner and return (and backprop into!) an arbitrary row of
        # the last shard.
        ids_s = jax.lax.dynamic_slice_in_dim(ids_l, shard * S, S)
        valid = (ids_s >= 0) & (ids_s < R)
        ids_s = jnp.where(valid, ids_s, 0)
        owner = (ids_s // rows_per).astype(jnp.int32)
        # 2. bucket by owner (sort + gather-packed, capacity S per bucket)
        order = jnp.argsort(owner)              # stable
        sorted_ids = jnp.take(ids_s, order)
        sorted_owner = jnp.take(owner, order)
        starts = jnp.searchsorted(sorted_owner, jnp.arange(n, dtype=jnp.int32))
        ends = jnp.searchsorted(
            sorted_owner, jnp.arange(n, dtype=jnp.int32), side="right"
        )
        idx = starts[:, None] + jnp.arange(S)[None, :]          # (n, S)
        in_bucket = idx < ends[:, None]
        send_ids = jnp.where(
            in_bucket, jnp.take(sorted_ids, jnp.clip(idx, 0, S - 1)), 0
        ).astype(jnp.int32)
        # 3. exchange buckets; gather owned rows (padding slots clip → garbage,
        # never read back: the requester indexes only real bucket positions)
        recv_ids = jax.lax.all_to_all(send_ids, axis, split_axis=0, concat_axis=0)
        local_ids = jnp.clip(recv_ids - shard * rows_per, 0, rows_per - 1)
        rows = jnp.take(table_shard, local_ids.reshape(-1), axis=0)
        rows = rows.reshape(n, S, -1)
        # 4. rows back to requesters; unsort into slice order
        recv_rows = jax.lax.all_to_all(rows, axis, split_axis=0, concat_axis=0)
        emb_sorted = recv_rows[sorted_owner, jnp.arange(S) - jnp.take(starts, sorted_owner)]
        inv = jnp.argsort(order)
        emb_slice = jnp.take(emb_sorted, inv, axis=0)           # (S, D)
        # zero both the value and the cotangent of miss slots
        emb_slice = emb_slice * valid[:, None].astype(emb_slice.dtype)
        # 5. assemble the n slices
        return jax.lax.all_gather(emb_slice, axis, axis=0, tiled=True)

    # the final all_gather makes the output replicated over `axis`, but the
    # static varying-axes check can't infer that — disable it
    try:
        fn = shard_map(
            local, mesh=mesh, in_specs=(P(axis, None), ids_spec),
            out_specs=out_spec, check_vma=False,
        )
    except TypeError:  # older jax spells it check_rep
        fn = shard_map(
            local, mesh=mesh, in_specs=(P(axis, None), ids_spec),
            out_specs=out_spec, check_rep=False,
        )
    return fn(table, ids)


def sharded_lookup(
    table: jnp.ndarray,  # (R, D) row-sharded over `axis`
    ids: jnp.ndarray,    # (B,) — replicated or sharded over `data_axis`
    mesh,
    axis: str = "model",
    data_axis: Optional[str] = None,
    strategy: str = "auto",
) -> jnp.ndarray:
    """Lookup on a row-sharded table.

    ``strategy="a2a"`` routes through :func:`a2a_lookup` (bucketed id exchange —
    the designed kernel); ``"psum"`` uses the local-gather + psum assembly;
    ``"auto"`` picks a2a whenever the batch divides the mesh axes.

    Psum path: each device holds rows [s*R/n, (s+1)*R/n); ids outside the local
    range contribute zeros; one psum over ``axis`` assembles the full (B, D)
    result. Either way the backward pass lands row grads on the owning device
    only and the table is never all-gathered (the SOK ``lookup_sparse``
    property, reference ``tf/distributed/embedding.py:144``).

    When ``data_axis`` is given and the id count divides it, the id list is
    split over the data axis too (hybrid DP×MP): each data shard looks up only
    its batch slice and the result comes back batch-sharded — collectives stay
    (B/dp, D)-sized over the model axis only.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]
    R = table.shape[0]
    if R % n != 0:
        raise ValueError(f"table rows {R} not divisible by mesh axis {axis}={n}")
    rows_per = R // n
    if strategy not in ("auto", "a2a", "psum"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy in ("auto", "a2a"):
        dp = mesh.shape[data_axis] if (data_axis is not None and data_axis in mesh.shape) else 1
        divides = ids.shape[0] % (dp * n) == 0 if dp > 1 else ids.shape[0] % n == 0
        if divides:
            return a2a_lookup(table, ids, mesh, axis=axis, data_axis=data_axis)
        if strategy == "a2a":
            raise ValueError(
                f"a2a strategy needs batch {ids.shape[0]} divisible by mesh axes"
            )
    use_data = (
        data_axis is not None
        and data_axis in mesh.shape
        and mesh.shape[data_axis] > 1
        and ids.shape[0] % mesh.shape[data_axis] == 0
    )
    ids_spec = P(data_axis) if use_data else P()
    out_spec = P(data_axis, None) if use_data else P()

    def local(table_shard, ids):
        shard = jax.lax.axis_index(axis)
        local_ids = ids - shard * rows_per
        in_range = (local_ids >= 0) & (local_ids < rows_per)
        safe = jnp.clip(local_ids, 0, rows_per - 1)
        rows = jnp.take(table_shard, safe, axis=0)
        rows = jnp.where(in_range[:, None], rows, 0.0)
        return jax.lax.psum(rows, axis)

    fn = shard_map(
        local, mesh=mesh, in_specs=(P(axis, None), ids_spec), out_specs=out_spec
    )
    return fn(table, ids)


def sharded_row_scatter_add(
    table: jnp.ndarray,    # (R, D) row-sharded over `axis`
    ids: jnp.ndarray,      # (B,) — valid positions must target UNIQUE rows
    updates: jnp.ndarray,  # (B, D)
    valid: Optional[jnp.ndarray],
    mesh,
    axis: str = "model",
) -> jnp.ndarray:
    """Shard-mapped :func:`ops.scatter.pallas_row_scatter_add`: each device
    applies only the rows it owns to its local shard — zero communication over
    the model axis (ids/updates replicated), HBM traffic ~ touched rows per
    shard. This is the write half of the SOK pair: without it a ``pallas_call``
    over a sharded operand makes XLA replicate-compute-reshard (an all-gather
    of the whole table per step)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from .scatter import pallas_row_scatter_add

    n = mesh.shape[axis]
    rows_per = table.shape[0] // n
    if valid is None:
        valid = jnp.ones(ids.shape, bool)

    def local(table_shard, ids, updates, valid):
        shard = jax.lax.axis_index(axis)
        local_ids = ids - shard * rows_per
        owned = valid & (local_ids >= 0) & (local_ids < rows_per)
        safe = jnp.clip(local_ids, 0, rows_per - 1).astype(jnp.int32)
        return pallas_row_scatter_add(table_shard, safe, updates, owned)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P()), out_specs=P(axis, None),
    )
    return fn(table, ids, updates, valid)


def sharded_update_rows(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    updates: jnp.ndarray,  # (B, D) rows to add; duplicate ids accumulate
    mesh,
    axis: str = "model",
) -> jnp.ndarray:
    """Scatter-add updates into a row-sharded table (duplicates accumulate)."""
    from .scatter import dedup_rows

    sids, summed, valid = dedup_rows(ids.reshape(-1), updates)
    return sharded_row_scatter_add(table, sids, summed, valid, mesh, axis)
