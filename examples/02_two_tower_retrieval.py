"""Two-tower retrieval with in-batch sampled softmax + corpus top-k eval
(reference example 05; BASELINE.md MovieLens-25M north-star shape)."""

import models_tpu as mm

train, valid = mm.data.datasets.get_movielens(variant="ml-25m", num_rows=50_000)

model = mm.TwoTowerModel(
    train.schema, query_tower=(128, 64), embedding_dim=64, logits_temperature=0.6
)
model.compile(optimizer="adagrad", learning_rate=0.05, embedding_optimizer="lazy_adam")
model.fit(train, epochs=2, batch_size=4096)

topk = model.to_top_k_encoder(train, k=100)
topk.compile()
print(topk.evaluate(valid, batch_size=1024))
