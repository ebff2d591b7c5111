"""Mesh-distributed training: data-parallel batches + model-sharded tables.
Run with XLA_FLAGS=--xla_force_host_platform_device_count=8 on CPU to simulate."""

import jax

import models_tpu as mm

train, _ = mm.data.datasets.get_movielens(variant="ml-25m", num_rows=20_000)

devices = jax.devices()
if len(devices) < 2:
    devices = jax.devices("cpu")
mesh = mm.make_mesh({"data": len(devices) // 2 or 1, "model": 2 if len(devices) >= 2 else 1},
                    devices=devices)

model = mm.TwoTowerModel(train.schema, query_tower=(64, 32), embedding_dim=32)
model.compile(optimizer="adagrad", learning_rate=0.05)
model.fit(train, epochs=1, batch_size=1024, mesh=mesh)
print("trained over mesh", dict(mesh.shape))
