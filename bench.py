"""Benchmark: two-tower retrieval training throughput on one TPU chip.

Config mirrors the BASELINE.md north-star shape (MovieLens-25M-scale two-tower,
in-batch sampled softmax over the global batch): 162k users x 62k items, 128-d
embeddings, [256,128] MLP towers, batch 8192.

Measurement notes: the axon tunnel to the TPU makes per-call timing unreliable
(``block_until_ready`` can return before device completion and each call carries
~25ms fixed RTT), so the training loop runs *inside* ``lax.scan`` in a single
executable and we time the host fetch of the final loss scalar at two different
step counts — the marginal time per step ((T2-T1)/(N2-N1)) cancels the fixed
tunnel overhead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` divides by 100_000 examples/sec — a nominal order-of-magnitude
figure for the reference's GPU two-tower pipeline (the reference publishes no
absolute numbers, BASELINE.md).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_EXAMPLES_PER_SEC = 100_000.0

BATCH = 8192
N1, N2 = 10, 60


def main():
    # persistent compile cache: repeat bench runs skip the ~60s TPU compiles
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import optax
    from flax import nnx

    from models_tpu.core.block import call_block
    from models_tpu.core.types import ModelContext, to_device_batch
    from models_tpu.data import Loader, generate_data
    from models_tpu.models import TwoTowerModel

    ds = generate_data("movielens-25m", num_rows=BATCH, seed=3)
    model = TwoTowerModel(ds.schema, query_tower=(256, 128), embedding_dim=128)
    model.compile(optimizer="adagrad", learning_rate=0.05)
    loader = Loader(ds, batch_size=BATCH, drop_last=True)
    model.build(loader)

    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    tx = model._tx
    opt_state = tx.init(params)
    loss_fns = model._resolve_task_losses()

    x_host, y_host = loader.peek()
    x = to_device_batch(x_host)
    y = (
        {k: jnp.asarray(v) for k, v in y_host.items()}
        if isinstance(y_host, dict)
        else jnp.asarray(y_host)
    )

    def train_step(carry, _):
        params, opt_state = carry

        def loss_fn(p):
            mod = nnx.merge(graphdef, p, rest)
            context = ModelContext(features=x, targets=y, step=0)
            # fused blockwise CE path (no metrics on these steps)
            context["need_logits"] = False
            preds = call_block(mod, x, targets=y, training=True, context=context)
            pred_dict = mod._as_pred_dict(preds)
            total, _ = mod._compute_losses(pred_dict, x, loss_fns)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def make_runner(n):
        @jax.jit
        def run(params, opt_state):
            (params, opt_state), losses = jax.lax.scan(
                train_step, (params, opt_state), None, length=n
            )
            return losses[-1]

        return run

    timings = {}
    for n in (N1, N2):
        run = make_runner(n)
        _ = float(run(params, opt_state))  # warmup + compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            loss = float(run(params, opt_state))
            best = min(best, time.perf_counter() - t0)
        timings[n] = best

    step_time = (timings[N2] - timings[N1]) / (N2 - N1)
    examples_per_sec = BATCH / step_time
    result = {
        "metric": "two_tower_train_examples_per_sec",
        "value": round(examples_per_sec, 1),
        "unit": "examples/sec",
        "vs_baseline": round(examples_per_sec / REFERENCE_EXAMPLES_PER_SEC, 3),
    }
    print(json.dumps(result))
    print(
        f"# device={jax.devices()[0].device_kind} batch={BATCH} "
        f"marginal_step_ms={step_time*1000:.3f} t[{N1}]={timings[N1]*1000:.1f}ms "
        f"t[{N2}]={timings[N2]*1000:.1f}ms final_loss={loss:.4f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
