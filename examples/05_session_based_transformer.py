"""Session-based next-item transformer with sampled softmax over the catalog
(reference example 08)."""

import models_tpu as mm

data = mm.generate_data("sequence-testing", num_rows=20_000)

model = mm.SessionBasedTransformerModel(
    data.schema,
    transformer=mm.GPT2Block(d_model=64, n_head=4, n_layer=2),
    embedding_dim=64,
    num_sampled=100,  # popularity-sampled softmax with logQ correction
)
model.compile(optimizer="adam", learning_rate=0.003)

pre = mm.SequencePredictNext(data.schema, target="item_id_seq")
model.fit(data, epochs=2, batch_size=256, pre=pre)
print(model.evaluate(data, batch_size=256,
                     pre=mm.SequencePredictLast(data.schema, target="item_id_seq")))
