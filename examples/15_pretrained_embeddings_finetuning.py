"""Warm-start from pretrained embeddings, then fine-tune incrementally with
layer freezing.

Mirrors two reference usecases:
``examples/usecases/entertainment-with-pretrained-embeddings.ipynb`` (bring
offline-trained item vectors into a ranking model) and
``examples/usecases/incremental-training-with-layer-freezing.ipynb`` (train a
new data window while selected layers stay fixed).

Workflow:
  phase 1 — seed the ``movieId`` table with offline-produced vectors
            (word2vec, a prior run's exported item tower, ...), FREEZE it, and
            train the rest of the model around it on the first data window;
  phase 2 — unfreeze and continue on the next window. Optimizer moments and
            the global step persist across ``fit()`` calls, so this is a true
            warm continuation, not a restart.
"""

import numpy as np

import models_tpu as mm
from models_tpu.blocks import MLPBlock

train, valid = mm.data.datasets.get_movielens(variant="ml-100k")
# one binary task (the reference usecases predict rating_binary)
schema = train.schema.excluding_by_name(["rating", "title"])

# "pretrained" item vectors produced offline — any (cardinality, dim) array
item_card = int(schema["movieId"].cardinality)
rng = np.random.default_rng(7)
pretrained = (rng.normal(size=(item_card, 16)) / 4.0).astype(np.float32)

# weights= seeds the movieId table; every other table initializes fresh
inputs = mm.InputBlockV2(
    schema, dim=16, table_kwargs={"movieId": {"weights": pretrained}}
)
model = mm.Model(inputs >> MLPBlock([64, 32]), mm.OutputBlock(schema), schema=schema)
model.compile(optimizer="adagrad", learning_rate=0.05)

# two "days" of incremental data out of the training window
day1, day2 = train.split([0.5, 0.5], seed=11)

# ---- phase 1: frozen pretrained table, train everything else -------------
model.freeze_blocks("movieId")          # by block name; block objects work too
model.fit(day1, epochs=2, batch_size=1024, verbose=0)

item_table = inputs["categorical"]["movieId"]
after = np.asarray(item_table.table.value)[:item_card]
assert np.array_equal(after, pretrained), "frozen table must not move"
print("phase 1 done — pretrained item vectors untouched")

# ---- phase 2: unfreeze and fine-tune on the next window ------------------
# no re-compile: adagrad accumulators and the global step carry over, so the
# pretrained table starts its updates with the warm state phase 1 built up
model.unfreeze_all_frozen_blocks()
model.fit(day2, epochs=2, batch_size=1024, verbose=0)

after = np.asarray(item_table.table.value)[:item_card]
assert not np.array_equal(after, pretrained), "unfrozen table must train"
drift = float(np.abs(after - pretrained).mean())
print(f"phase 2 done — item vectors fine-tuned (mean drift {drift:.2e})")

metrics = model.evaluate(valid, batch_size=1024, return_dict=True)
print({k: round(float(v), 4) for k, v in metrics.items() if "auc" in k or "loss" in k})
