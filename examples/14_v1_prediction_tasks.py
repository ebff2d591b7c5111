"""V1 multi-task API: PredictionTasks with per-task towers, task weights and a
shared bias block (reference ``tf/prediction_tasks/multi.py`` — the pre-V2 API
many reference users still run)."""

import models_tpu as mm

train, valid = mm.data.datasets.get_aliccp(num_rows=50_000)

body = mm.InputBlockV2(train.schema) >> mm.MLPBlock([64, 32])
output = mm.PredictionTasks(
    train.schema,
    # a single block is CLONED per task (fresh params each, reference semantics)
    task_blocks=mm.MLPBlock([16]),
    # weights keyed by bare target name; compile(loss_weights=...) would override
    task_weight_dict={"click": 1.0, "conversion": 0.5},
    # shared bias tower: its Dense(1) projection is added to every task's logits
    bias_block=mm.MLPBlock([8]),
)
model = mm.Model(body, output, schema=train.schema)
model.compile(optimizer="adam", learning_rate=1e-3)
model.fit(train, epochs=2, batch_size=2048)
print(model.evaluate(valid, batch_size=2048))
