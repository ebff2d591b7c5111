"""TPU performance features in one place: mixed_bfloat16, steps_per_execution
with the device-resident data path, the row-sparse embedding optimizer, and a
mesh-sharded top-k serving index.

These are the knobs behind the bench.py numbers (see README "Measured")."""

import models_tpu as mm

# bf16 matmuls with fp32 accumulation on the hot paths (~1.4x step time)
mm.set_dtype_policy("mixed_bfloat16")

train, valid = mm.data.datasets.get_movielens(variant="ml-25m", num_rows=262_144)

import jax.numpy as jnp

# bf16-at-rest tables: half the table HBM + gather/update traffic; updates
# write back with stochastic rounding so training quality matches fp32
# (16M x 128 catalogs fit on one chip this way — fp32 sparse caps at ~8M)
model = mm.TwoTowerModel(train.schema, query_tower=(256, 128), embedding_dim=128,
                         table_dtype=jnp.bfloat16)
model.compile(
    optimizer="adagrad",
    learning_rate=0.05,
    # bf16-at-rest optimizer slots for the dense params (state traffic /2)
    optimizer_state_dtype="bfloat16",
    # row-sparse optimizer: Pallas scatter touches only the looked-up rows —
    # wins big once tables are HBM-scale (and is the only way past ~8M rows)
    embedding_optimizer="lazy_adam",
    # pack 32 steps per dispatch; with a RAM-sized dataset fit() also uploads
    # the columns once and gathers batches on device (no per-step host traffic)
    steps_per_execution=32,
    train_metrics_steps=1000,
)
model.fit(train, epochs=3, batch_size=8192)

# mesh-sharded serving: candidates row-sharded over the model axis,
# per-shard partial top-k merged over ICI
mesh = mm.make_mesh({"data": 1, "model": len(__import__("jax").devices())})
topk = model.to_top_k_encoder(train, k=10, mesh=mesh)
topk.compile()
print(topk.evaluate(valid, batch_size=4096))
