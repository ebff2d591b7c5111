"""The torch side-backend's block DSL (reference ``merlin/models/torch`` —
Lightning there; a plain torch loop here). Same schema, same Loader, second
engine."""

import models_tpu as mm
from models_tpu import torch_backend as t

train, valid = mm.data.generate_data("music-streaming", num_rows=10_000,
                                     set_sizes=(0.8, 0.2))

# zoo model built FROM blocks (TabularInputBlock → CrossBlock → MLP → heads)
model = t.DCNModel(train.schema, depth=2, deep_block=(64, 32), dim=16, low_rank=8)
model.fit(train, epochs=2, batch_size=512, learning_rate=1e-3, verbose=1)
print(model.evaluate(valid, batch_size=512))

# or compose by hand, reference-style
import torch.nn as nn

inputs = t.TabularInputBlock(train.schema, dim=16)
body = t.Block(
    t.CrossBlock(inputs.out_dim, depth=1),
    t.MLPBlock((64, 32), inputs.out_dim),
)
custom = t.Model(inputs, body, t.TabularOutputBlock(train.schema, 32),
                 schema=train.schema)
custom.fit(train, epochs=1, batch_size=512)
print(custom.predict(valid, batch_size=512).keys())
