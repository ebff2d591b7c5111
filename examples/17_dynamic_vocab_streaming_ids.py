"""Dynamic-vocabulary embeddings: train on streaming / unbounded id spaces.

The reference's answer to unbounded id spaces is ``sok.DynamicVariable`` (a
GPU hash-table embedding that allocates rows as unseen ids arrive,
``merlin/models/tf/distributed/embedding.py:16-233``) plus raw-string ids via
``tf.nn.safe_embedding_lookup_sparse`` (``tf/inputs/embedding.py:439``). The
TPU-native equivalent here is ``Embeddings(dynamic=True)`` /
``DynamicEmbeddingTable``: a fixed-capacity table behind a device-resident
open-addressing id→slot hash map — unseen ids allocate rows INSIDE the
compiled train step; no vocabulary pass, no re-categorify between days.

This example simulates two days of a CTR log where day 2 introduces new item
ids (and raw STRING user ids hashed by the loader-side helper), then shows
incremental training picking the new ids up mid-stream.
"""

import numpy as np

import models_tpu as mm
from models_tpu.inputs.dynamic import DynamicEmbeddingTable, string_id_hash
from models_tpu.schema import Schema, Tags, create_categorical_column

rng = np.random.default_rng(7)

# ---------------------------------------------------------------------------
# day 1: items 0..199 (raw ids are arbitrary 31-bit values, NOT categorified)
# ---------------------------------------------------------------------------
def make_day(item_lo, item_hi, n=4096):
    raw_items = rng.integers(item_lo, item_hi, n).astype(np.int64) * 2654435761 % (2**31)
    users = np.array([f"user_{u}" for u in rng.integers(0, 500, n)])
    # planted signal: clicks depend on item parity
    clicks = (raw_items % 2).astype(np.float32)
    return raw_items, users, clicks


schema = Schema([
    create_categorical_column("item", 1_000_000_000, tags=(Tags.ITEM_ID,)),
    create_categorical_column("user", 1_000_000_000, tags=(Tags.USER_ID,)),
    create_categorical_column("click", 1, tags=(Tags.TARGET, Tags.BINARY_CLASSIFICATION)),
])

items1, users1, clicks1 = make_day(0, 200)
day1 = mm.Dataset(
    {"item": items1, "user": string_id_hash(users1).astype(np.int64),
     "click": clicks1},
    schema=schema,
)

emb = mm.Embeddings(
    schema.categorical.excluding_by_tag(Tags.TARGET),
    dim=16,
    dynamic=True,
    dynamic_capacity={"item": 2048, "user": 1024},
)
model = mm.Model(
    mm.SequentialBlock([mm.InputBlockV2(schema, categorical=emb), mm.MLPBlock([32])]),
    mm.BinaryOutput("click"),
)
model.compile(optimizer="adam", learning_rate=0.05, metrics=["auc"])
model.fit(day1, batch_size=512, epochs=4, verbose=0)

from models_tpu.core.block import iter_blocks

dyn = next(b for b in iter_blocks(model) if isinstance(b, DynamicEmbeddingTable))
print(f"day 1: {dyn.num_allocated} item rows allocated (200 distinct ids)")

# ---------------------------------------------------------------------------
# day 2: 100 NEW items appear — no re-categorify, no table rebuild
# ---------------------------------------------------------------------------
items2, users2, clicks2 = make_day(200, 300)
day2 = mm.Dataset(
    {"item": items2, "user": string_id_hash(users2).astype(np.int64),
     "click": clicks2},
    schema=schema,
)
hist = model.fit(day2, batch_size=512, epochs=4, verbose=0)
print(f"day 2: {dyn.num_allocated} item rows allocated (new ids joined mid-stream)")
res = model.evaluate(day2, batch_size=512, return_dict=True)
print(f"day-2 AUC after incremental training: {res['auc']:.3f}")
assert dyn.num_allocated > 250
assert res["auc"] > 0.9, "new ids should be learnable without a rebuild"
print("OK")
