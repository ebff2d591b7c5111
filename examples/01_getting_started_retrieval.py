"""Getting started: matrix factorization retrieval on MovieLens-100k
(parity config: reference example 01 + BASELINE.md PR1 target)."""

import models_tpu as mm

train, valid = mm.data.datasets.get_movielens(variant="ml-100k", num_rows=20_000)

model = mm.MatrixFactorizationModel(train.schema, dim=64)
model.compile(optimizer="adam", learning_rate=0.01)
model.fit(train, epochs=3, batch_size=1024, validation_data=valid)

print(model.evaluate(valid, batch_size=1024))

# export embeddings + build a servable top-k index
topk = model.to_top_k_encoder(k=10)
topk.compile()
print("corpus eval:", topk.evaluate(valid, batch_size=1024))
