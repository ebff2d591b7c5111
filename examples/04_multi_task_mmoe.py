"""Multi-task MMOE over click+conversion (reference example 07 / DCN multi-task)."""

import models_tpu as mm

train, valid = mm.data.datasets.get_aliccp(num_rows=50_000)

model = mm.MMOEModel(train.schema, expert_block=(64, 32), num_experts=4, embedding_dim=32)
model.compile(loss_weights={"click/BinaryOutput": 1.0, "conversion/BinaryOutput": 0.5})
model.fit(train, epochs=2, batch_size=2048)
print(model.evaluate(valid, batch_size=2048))
