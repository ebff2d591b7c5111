"""DLRM CTR ranking on Ali-CCP (reference example 04 / BASELINE.md AUC config)."""

import models_tpu as mm

train, valid = mm.data.datasets.get_aliccp(num_rows=50_000)
schema = train.schema.excluding_by_name("conversion")

model = mm.DLRMModel(schema, embedding_dim=64, bottom_block=(128,), top_block=(128, 64))
model.compile(optimizer="adagrad", learning_rate=0.05)
model.fit(train, epochs=2, batch_size=2048, validation_data=valid)
print(model.evaluate(valid, batch_size=2048))
