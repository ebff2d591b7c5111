"""Multi-host initialization glue — the ``hvd.init()`` replacement
(reference ``tf/distributed/backend.py:12-21`` + the multi-worker examples
under ``examples/usecases/multi-gpu/``).

A JAX multi-host program is single-controller-per-host: every host runs the
same script, ``initialize()`` wires them into one runtime, and after that
``jax.devices()`` spans all hosts, meshes built from it shard across DCN+ICI,
and the engine's chief-only guards (``parallel.mesh.chief_only``) handle I/O.

Degenerate single-process usage is a no-op — the same strategy the reference
uses to test Horovod code paths without a cluster (SURVEY §4).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Join the multi-host runtime. No-op when single-process (args absent and
    no cluster env detected) — safe to call unconditionally at program start.

    Must not touch the XLA backend before ``jax.distributed.initialize`` —
    calling e.g. ``jax.process_count()`` here would initialize the backend and
    make distributed init illegal (caught by the 2-process smoke test)."""
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    env_has_cluster = any(
        k in os.environ
        for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if coordinator_address is None and num_processes is None and not env_has_cluster:
        return  # single host; nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def shutdown() -> None:
    try:
        jax.distributed.shutdown()
    except Exception:
        pass


def local_loader_kwargs() -> dict:
    """Per-host sharding kwargs for ``Loader`` (the reference wires
    ``global_size/global_rank`` from hvd, ``tf/loader.py:308-312``)."""
    return {"global_size": jax.process_count(), "global_rank": jax.process_index()}
