"""Long-running training: warm continuation, learning-rate schedules, low-
precision optimizer slots, and exact preemption recovery.

Consecutive ``fit()`` calls continue optimizer moments and the global step
(Keras semantics — ``compile()`` resets), ``ModelCheckpoint`` snapshots
(weights, optimizer slots, step) each epoch, and
``CheckpointManager.restore_training`` re-arms all three so a preempted job
resumes the exact trajectory.
"""

import tempfile

import optax

import models_tpu as mm
from models_tpu.utils.checkpoint import CheckpointManager, ModelCheckpoint

train, valid = mm.data.datasets.get_movielens(variant="ml-100k")

model = mm.TwoTowerModel(train.schema, query_tower=(64, 32), embedding_dim=32)
model.compile(
    optimizer="adam",
    # any step->lr callable works; optax ships the usual schedule zoo
    learning_rate=optax.warmup_cosine_decay_schedule(
        0.0, 0.05, warmup_steps=20, decay_steps=400
    ),
    # optimizer slots stored bfloat16 at rest: the dense embedding update is
    # HBM-bound, so halving slot width cuts its traffic share ~2x
    optimizer_state_dtype="bfloat16",
)

ckpt_dir = tempfile.mkdtemp(prefix="two_tower_ckpts_")
cb = ModelCheckpoint(ckpt_dir, every_n_epochs=1)

# phase 1: 2 epochs, checkpointing each epoch
model.fit(train, epochs=2, batch_size=1024, shuffle=False, callbacks=[cb], verbose=0)

# warm continuation in-process: this fit picks up the Adam moments, the step
# count (so the cosine schedule keeps decaying), and validates every 2nd epoch
model.fit(
    train, epochs=4, initial_epoch=2, batch_size=1024, shuffle=False,
    validation_data=valid, validation_freq=2, validation_steps=8,
    callbacks=[cb], verbose=0,
)

# preemption drill: a FRESH process/model resumes from the checkpoint
resumed = mm.TwoTowerModel(train.schema, query_tower=(64, 32), embedding_dim=32)
resumed.compile(
    optimizer="adam",
    learning_rate=optax.warmup_cosine_decay_schedule(
        0.0, 0.05, warmup_steps=20, decay_steps=400
    ),
    optimizer_state_dtype="bfloat16",
)
last_epoch = CheckpointManager(ckpt_dir).restore_training(resumed, data=train)
h = resumed.fit(
    train, epochs=last_epoch + 3, initial_epoch=last_epoch + 1,
    batch_size=1024, shuffle=False, verbose=0,
)
print(f"resumed from epoch {last_epoch}, continued losses: {h.history['loss']}")
