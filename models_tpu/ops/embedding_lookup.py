"""Embedding lookup ops: Pallas double-buffered gather + mesh-sharded lookup.

SURVEY.md §7 kernel #1 — the TPU answer to SOK's fused all2all lookup
(reference ``tf/distributed/embedding.py:144``):

- :func:`pallas_gather` — rows stream HBM→VMEM with double-buffered async DMA
  driven by scalar-prefetched ids (PrefetchScalarGridSpec), overlapping row
  fetches with writes. For big tables XLA's dynamic-gather is already decent;
  the kernel exists for the HBM-resident (non-VMEM-fitting) table case and as
  the base of the remote-DMA variant.
- :func:`sharded_lookup` — row-sharded table over a mesh axis: each device
  gathers the ids that fall in its row range from its local shard and the
  partial results are ``psum``'d over the axis (zero-filled misses). One small
  (B, D) reduction rides ICI instead of any table movement.
- :func:`sharded_update_rows` — the matching scatter-add for row-sparse
  optimizer updates on a sharded table.
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
    """Gather rows of an HBM-resident table with double-buffered row DMA."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = ids.shape[0]
    R, D = table.shape
    pad = (-B) % block
    ids_p = jnp.pad(ids, (0, pad)) if pad else ids
    n_blocks = ids_p.shape[0] // block

    def kernel(ids_ref, table_ref, out_ref, scratch, sems):
        blk = pl.program_id(0)

        def get_dma(slot, j):
            row = ids_ref[blk * block + j]
            return pltpu.make_async_copy(
                table_ref.at[row], scratch.at[slot], sems.at[slot]
            )

        get_dma(0, 0).start()

        def body(j, _):
            slot = j % 2

            @pl.when(j + 1 < block)
            def _():
                get_dma((j + 1) % 2, j + 1).start()

            get_dma(slot, j).wait()
            out_ref[j, :] = scratch[slot]
            return ()

        jax.lax.fori_loop(0, block, body, ())

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # table stays in HBM
        out_specs=pl.BlockSpec((block, D), lambda b, ids_ref: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, D), table.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ids_p.shape[0], D), table.dtype),
        interpret=interpret,
    )(ids_p, table)
    return out[:B]


# ---------------------------------------------------------------------------
# mesh-sharded lookup (shard_map + psum)
# ---------------------------------------------------------------------------

def sharded_lookup(
    table: jnp.ndarray,  # (R, D) row-sharded over `axis`
    ids: jnp.ndarray,    # (B,) — replicated or sharded over `data_axis`
    mesh,
    axis: str = "model",
    data_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Lookup on a row-sharded table: local gather of owned rows + psum.

    Each device holds rows [s*R/n, (s+1)*R/n); ids outside the local range
    contribute zeros; one psum over ``axis`` assembles the full (B, D) result.
    The backward pass of this computation is automatically the row-local
    scatter-add — gradients never leave the owning device; the table is never
    all-gathered (the SOK ``lookup_sparse`` property, reference
    ``tf/distributed/embedding.py:144``).

    When ``data_axis`` is given and the id count divides it, the id list is
    split over the data axis too (hybrid DP×MP): each data shard looks up only
    its batch slice and the result comes back batch-sharded — the psum stays a
    (B/dp, D) reduction over the model axis only.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]
    R = table.shape[0]
    if R % n != 0:
        raise ValueError(f"table rows {R} not divisible by mesh axis {axis}={n}")
    rows_per = R // n
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


def sharded_update_rows(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    updates: jnp.ndarray,  # (B, D) rows to add
    mesh,
    axis: str = "model",
) -> jnp.ndarray:
    """Scatter-add updates into a row-sharded table (each device applies only the
    rows it owns; no communication at all — ids/updates are replicated)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]
    rows_per = table.shape[0] // n

    def local(table_shard, ids, updates):
        shard = jax.lax.axis_index(axis)
        local_ids = ids - shard * rows_per
        in_range = (local_ids >= 0) & (local_ids < rows_per)
        safe = jnp.clip(local_ids, 0, rows_per - 1)
        upd = jnp.where(in_range[:, None], updates, 0.0)
        return table_shard.at[safe].add(upd)

    fn = shard_map(
        local, mesh=mesh, in_specs=(P(axis, None), P(), P()), out_specs=P(axis, None)
    )
    return fn(table, ids, updates)
