"""True multi-process jax.distributed smoke test (the reference tests Horovod
via `horovodrun -np 2` launches, tests/unit/tf/horovod/test_horovod.py:29-35;
here two local processes join one JAX runtime over a localhost coordinator).

Each worker: 2 virtual CPU devices -> 4 global; builds a global mesh, makes a
process-local-sharded global array, all-reduces it, and shards the Loader by
process. The parent asserts both workers agree on the global sum and loaded
disjoint row sets.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]
repo = sys.argv[4]
sys.path.insert(0, repo)

from models_tpu.parallel import distributed

distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))
sharding = NamedSharding(mesh, P("data"))

# global (8,) array: each host contributes its local 4 rows
local = np.arange(4, dtype=np.float32) + 100.0 * pid
garr = jax.make_array_from_process_local_data(sharding, local, (8,))
total = float(jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr).addressable_data(0))

# per-host loader sharding
from models_tpu.data import Loader, generate_data

kw = distributed.local_loader_kwargs()
assert kw == {"global_size": 2, "global_rank": pid}, kw
ds = generate_data("testing", num_rows=64, seed=11)
loader = Loader(ds, batch_size=8, shuffle=True, seed=5, drop_last=True, **kw)
ids = np.concatenate([np.asarray(b[0]["item_id"]) for b in loader]).tolist()

with open(out_path, "w") as f:
    json.dump({"total": total, "n_batches": len(loader), "ids_hash": ids}, f)
distributed.shutdown()
"""


@pytest.mark.timeout(180)
def test_two_process_jax_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    repo = os.path.join(os.path.dirname(__file__), "..", "..")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)

    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"out_{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker_py), str(pid), str(port), str(out), repo],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    results = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        assert p.returncode == 0, stderr.decode()[-2000:]
    for out in outs:
        results.append(json.loads(out.read_text()))

    # both hosts agree on the global all-reduced sum: (0+1+2+3) + (100..103)
    expect = float(np.sum(np.arange(4) + 0.0) + np.sum(np.arange(4) + 100.0))
    assert results[0]["total"] == expect
    assert results[1]["total"] == expect
    # loader shards are disjoint row sets covering different halves
    assert results[0]["n_batches"] == 4 and results[1]["n_batches"] == 4
    assert results[0]["ids_hash"] != results[1]["ids_hash"]
