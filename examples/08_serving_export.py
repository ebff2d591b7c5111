"""Serving export: ship trained models as code-free StableHLO artifacts.

Mirrors the reference's "export for Merlin Systems / Triton" workflow
(examples/04, ``model.save`` + ``.merlin`` sidecars): here the serving function
itself is serialized with ``jax.export`` — the artifact runs in ANY process
with jax installed (CPU or TPU), with no models_tpu import, and keeps the
``.merlin`` input/output schema sidecars for systems integration.
"""

import tempfile

import numpy as np

import models_tpu as mm
from models_tpu.core.types import to_device_batch
from models_tpu.data import Loader

# -- train a ranking model --------------------------------------------------
train, valid = mm.generate_data("e-commerce", num_rows=2000, set_sizes=(0.8, 0.2))
model = mm.DLRMModel(train.schema, embedding_dim=16, bottom_block=(32, 16), top_block=(32,))
model.compile(optimizer="adagrad", learning_rate=0.05)
model.fit(train, epochs=1, batch_size=256, verbose=0)

# -- export -----------------------------------------------------------------
serving_dir = tempfile.mkdtemp(prefix="dlrm_serving_")
model.export_serving(serving_dir, data=train, batch_size=256)
print("exported:", serving_dir)

# -- load + serve (no model code needed; see the pure-jax snippet in docs) ---
serving = mm.load_serving(serving_dir)
x, _ = Loader(valid, batch_size=256, shuffle=False, drop_last=True).peek()
x = {k: v for k, v in to_device_batch(x).items() if k != "__row_valid__"}
scores = serving(x)
first = next(iter(scores.values())) if isinstance(scores, dict) else scores
print("served batch:", np.asarray(first).shape)

# -- retrieval: export the full top-k index + query tower --------------------
rtrain, _ = mm.generate_data("movielens-100k", num_rows=2000, set_sizes=(0.9, 0.1))
retrieval = mm.MatrixFactorizationModel(rtrain.schema, dim=16)
retrieval.compile(learning_rate=0.05)
retrieval.fit(rtrain, epochs=1, batch_size=256, verbose=0)
# candidate_dtype=bf16: half-width index — the top-k serving cost is
# streaming the catalog, so this halves it (recall parity with fp32 tested)
import jax.numpy as jnp

topk = retrieval.to_top_k_encoder(rtrain, k=10, candidate_dtype=jnp.bfloat16)
topk.compile()
topk_dir = tempfile.mkdtemp(prefix="topk_serving_")
topk.export_serving(topk_dir, data=rtrain, batch_size=256)
topk_serving = mm.load_serving(topk_dir)
qx, _ = Loader(rtrain, batch_size=256, shuffle=False, drop_last=True).peek()
qx = {k: v for k, v in to_device_batch(qx).items() if k != "__row_valid__"}
rec = topk_serving(qx)
print("top-10 ids for first user:", np.asarray(rec["ids"])[0])

# -- int8 bin-quantized index: 4x smaller serving stream ----------------------
# Rows are norm-sorted so each 64-row bin shares one 127-level scale; both
# top-k phases then run int8 x int8 integer dots on the MXU with phase A kept
# int32 inside the conv fusion (see ops/topk.py). Recall@10 vs the fp32 index
# is ~0.99 on trained embeddings.
topk8 = retrieval.to_top_k_encoder(rtrain, k=10, candidate_dtype=jnp.int8)
topk8.compile()
rec8 = topk8.predict({k: v for k, v in qx.items()})
overlap = np.mean([
    len(set(a) & set(b)) / 10
    for a, b in zip(np.asarray(rec["ids"]), np.asarray(rec8["ids"]))
])
print(f"int8-vs-bf16 index top-10 overlap: {overlap:.3f}")
assert overlap >= 0.8, overlap
