"""Define your own architecture with the block DSL (reference example 06).

Shows the composition primitives: schema-filtered ParallelBlock branches,
``>>`` sequencing, residual/shortcut combinators, and OutputBlock target
inference — a custom "deep & cross & wide-ish" ranking tower no zoo
constructor ships.
"""

import models_tpu as mm
from models_tpu.blocks import CrossBlock, MLPBlock
from models_tpu.core.combinators import ParallelBlock

train = mm.generate_data("e-commerce", num_rows=2000)
valid = mm.generate_data("e-commerce", num_rows=600)
schema = train.schema

# input layer: every feature embedded/projected from the schema
inputs = mm.InputBlockV2(schema)

# two interaction branches over the same input vector, concatenated
interaction = ParallelBlock(
    {
        "cross": CrossBlock(depth=2),
        "deep": MLPBlock([64, 32]),
    },
    aggregation="concat",
)

# >> composition; OutputBlock builds one head per TARGET-tagged column
body = inputs >> interaction >> MLPBlock([32])
model = mm.Model(body, mm.OutputBlock(schema), schema=schema)

model.compile(optimizer="adam", learning_rate=1e-3)
model.fit(train, epochs=2, batch_size=256, validation_data=valid, verbose=0)
print(model.evaluate(valid, batch_size=256, return_dict=True))
