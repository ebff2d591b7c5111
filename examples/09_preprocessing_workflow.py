"""Preprocessing workflows: raw files → model-ready data (reference:
NVTabular workflows in ``merlin/datasets/entertainment/movielens/dataset.py``).

``get_movielens(path)`` on the raw ml-100k layout runs this pipeline
automatically; this example shows the ops composing a custom workflow.
"""

import numpy as np

import models_tpu as mm
from models_tpu.data import Dataset
from models_tpu.data.workflow import (
    Bucketize, Categorify, GroupbyCount, LambdaOp, TargetEncoding, Workflow,
)
from models_tpu.schema import ColumnSchema, Schema, Tags, create_continuous_column

# raw interaction log (strings/raw ids, as parsed from CSVs)
rng = np.random.default_rng(0)
n = 10_000
raw = Dataset(
    {
        "userId": rng.integers(1000, 2000, n),
        "movieId": rng.choice([7, 11, 42, 99, 123], n),
        "rating": rng.integers(1, 6, n).astype(np.float64),
        "age": rng.integers(10, 80, n).astype(np.float32),
    },
    schema=Schema([
        ColumnSchema("userId", dtype="int64"),
        ColumnSchema("movieId", dtype="int64"),
        create_continuous_column("rating"),
        create_continuous_column("age"),
    ]),
)
train, valid = raw.split([0.8, 0.2], seed=1)

wf = Workflow([
    Categorify(["userId", "movieId"]),                     # freq-ordered ids, 0 = OOV
    TargetEncoding("movieId", target="rating", kfold=5, p_smooth=20,
                   out="TE_movieId_rating", tags=Tags.ITEM),
    GroupbyCount("userId", log=True, tags=Tags.USER),
    Bucketize({"age": [0, 10, 20, 30, 40, 50, 60, 70, 80, 90]}, tags=Tags.USER),
    LambdaOp("rating", lambda v: (v > 3).astype("int32"), out="rating_binary",
             tags=(Tags.BINARY_CLASSIFICATION, Tags.TARGET), dtype="int32"),
])
train_t = wf.fit_transform(train)
valid_t = wf.transform(valid)      # reuses fitted vocabularies / statistics

print(train_t.schema)
model = mm.models.DLRMModel(
    train_t.schema.excluding_by_name("rating"), embedding_dim=16, top_block=(32, 16)
)
model.compile(learning_rate=0.01)
model.fit(train_t, epochs=2, batch_size=512, validation_data=valid_t)
print(model.evaluate(valid_t, batch_size=512))
