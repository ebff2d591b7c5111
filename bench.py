"""Benchmark suite: two-tower training (compute-only AND pipeline-included),
Pallas top-k serving, and the row-sparse optimizer at catalog scale.

Headline config mirrors the BASELINE.md north-star shape (MovieLens-25M-scale
two-tower, in-batch sampled softmax over the global batch): 162k users x 57k
items, 128-d embeddings, [256,128] MLP towers, batch 8192.

Measurement notes: the axon tunnel to the TPU makes per-call timing unreliable
(``block_until_ready`` can return before device completion, repeated identical
computations get memoized in the tunnel, and each call carries ~25ms fixed RTT),
so compute loops run *inside* ``lax.scan`` in a single executable with
step-dependent inputs, and we difference the host fetch time at two step counts
((T2-T1)/(N2-N1) cancels the fixed overhead). The pipeline number is honest
wall-clock through the engine: parquet → Loader (RAM-cached decode) → prefetch →
per-step jit dispatch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
``vs_baseline`` divides by 100_000 examples/sec — a nominal order-of-magnitude
figure for the reference's GPU two-tower pipeline (the reference publishes no
absolute numbers, BASELINE.md).
"""

import json
from functools import partial
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_EXAMPLES_PER_SEC = 100_000.0

BATCH = 8192
N1, N2 = 10, 60
PIPE_BATCHES = 128
BENCH_DATA = "/root/.cache/models_tpu_bench_data/ml25m_1048576"
# sparse-optimizer section table sizes (module-level so smoke tests can shrink)
SPARSE_R_MAIN, SPARSE_R_BIG, SPARSE_R_BF16 = 4_000_000, 8_000_000, 16_000_000


_SALT = [0.0]


def _next_salt() -> float:
    _SALT[0] += 1.0
    return _SALT[0]


# ---------------------------------------------------------------------------
# contention detection (VERDICT r2 #3): the tunnel/TPU is time-shared, and a
# contended window inflates every timing 1.5-3x. A fixed calibration kernel
# run before/after each section measures the window's slowdown; sections seen
# contended are retried and every recorded number carries its contention
# factor so rounds are comparable.
# ---------------------------------------------------------------------------

_CAL_STATE = {"min": None, "deadline": None}


_CAL_N1, _CAL_N2 = 8, 64  # marginal = 56 x 128MB = 7 GB of HBM read traffic
_CAL_WIN = 32 * 1024 * 1024  # 128MB reduce window per scan iteration


@partial(jax.jit, static_argnames=("length",))
def _cal_kernel(a, salt, length):
    # module-level jit: a closure re-defined per call would recompile on
    # every calibration. Each iteration reduces a 128MB window at a
    # CARRY-DEPENDENT offset — the offset dependence is what makes this a
    # real bandwidth probe: with a fixed window, XLA rewrites
    # sum(a*(1+c*eps)) to reuse sum(a) across scan iterations and the
    # "probe" collapses to a scalar chain (measured 3TB/s "bandwidth").
    def body(c, i):
        off = (i % 2) * _CAL_WIN + (c.astype(jnp.int32) % 2)
        sl = jax.lax.dynamic_slice(a, (off,), (_CAL_WIN,))
        return c + jnp.sum(sl) * 1e-20 + 1.0, ()

    c, _ = jax.lax.scan(body, salt, jnp.arange(length))
    return c


def _calibrate() -> float:
    """MARGINAL seconds for a fixed 7GB of HBM streaming traffic (length-8 vs
    length-64 scans over a 256MB array, timed back-to-back; best positive pair
    of 3). The hot training steps are HBM-bound, so the probe must be too.
    The marginal construction matters: a single absolute timing is ~30ms of
    tunnel RTT + ~2.5ms of kernel, so a 2x DEVICE slowdown moves it by <10%
    and contended windows read as clean (observed: bf16 section at 2x with
    factor 1.03). Differencing two adjacent timings cancels the RTT and
    measures only device time."""
    # 256MB backing array, allocated per-call and freed on return: sections
    # like the 8Mx128 sparse optimizer run within ~1GB of the HBM limit, and
    # a persistent probe array OOMs them.
    a = jnp.ones((2 * _CAL_WIN,), jnp.float32)

    def go(a, salt, length):
        return _cal_kernel(a, salt, length)

    for n in (_CAL_N1, _CAL_N2):
        float(go(a, jnp.float32(_next_salt()), n))  # compile+warm
    marginals = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(go(a, jnp.float32(_next_salt()), _CAL_N1))
        t1 = time.perf_counter()
        float(go(a, jnp.float32(_next_salt()), _CAL_N2))
        t2 = time.perf_counter()
        marginal = (t2 - t1) - (t1 - t0)
        if marginal > 0:
            marginals.append(marginal)
    if not marginals:
        return _CAL_STATE["min"] or 1.0  # all pairs poisoned; don't rebaseline
    # MEDIAN of pairs: min-of-pairs has a fat low tail (jitter in the short
    # timing subtracts from the marginal) and once produced an impossible
    # 5.6TB/s "bandwidth" that skewed every section's contention factor
    marginals.sort()
    med = marginals[len(marginals) // 2]
    # a physically impossible marginal (> ~1.3x the clean-window ceiling) is
    # residual jitter, not a faster machine: the session baseline is the MIN
    # over ~15 calibrate calls, so even one low-tail median would inflate
    # every later section's contention factor by its bias (observed: a
    # 1447 GB/s "baseline" reading every clean section as 1.4-1.5x contended)
    med = max(med, _CAL_FLOOR_S)
    if _CAL_STATE["min"] is None or med < _CAL_STATE["min"]:
        _CAL_STATE["min"] = med
    return med


def _cal_hbm_gbps(seconds: float) -> float:
    """Achieved HBM read bandwidth of the calibration marginal, GB/s."""
    gb = (_CAL_N2 - _CAL_N1) * (_CAL_WIN * 4) / 2**30
    return gb / max(seconds, 1e-9)


# Clean windows on this chip measure ~900-950 GB/s on the streaming probe
# (nominal v5e HBM ~819; the fused slice+reduce apparently reads slightly
# hot). Below this floor the window is contended regardless of how it
# compares to the session's best (an ALL-contended session rebaselines
# "best" downward and would otherwise read clean).
_CLEAN_HBM_GBPS = 550.0  # clean windows measure ~900-950 on this chip

# fastest CREDIBLE calibration marginal: clean windows top out ~950 GB/s on
# this probe; anything implying >1250 GB/s is timing jitter (v5e HBM ~819
# nominal), clamped before it can become the session baseline
_CAL_FLOOR_S = ((_CAL_N2 - _CAL_N1) * (_CAL_WIN * 4) / 2**30) / 1250.0


_SECTION_ERRORS = {}


def _try_section(name, fn, default, **kw):
    """Run a section; on an unrecoverable error (e.g. a kernel that fails to
    compile on the real chip) record it and return ``default`` so the bench
    still emits its JSON line — one broken section must not zero the round's
    entire record (round-3 lesson: the first bf16 Mosaic failure aborted main
    before the print and the driver recorded nothing). The failure sentinel
    contention factor is ``None`` (JSON null): ``float('inf')`` serialized as
    the non-standard token ``Infinity``, breaking strict-JSON consumers."""
    try:
        return _section(fn, **kw)
    except Exception as e:  # noqa: BLE001 — anything: report, don't die
        _SECTION_ERRORS[name] = f"{type(e).__name__}: {e}"[:300]
        print(f"# section {name} FAILED: {_SECTION_ERRORS[name]}", file=sys.stderr)
        return default, None


def _retry_in_subprocess(name, cli_args=()):
    """Re-run a failed section in a FRESH interpreter (``bench.py --section``).

    The remote-compile HTTP-500 failures reproduce only inside a long-lived
    bench process (both the round-3 and round-4 in-process re-queues failed
    again minutes later, while the identical section compiles and runs clean
    from a fresh process every time — accumulated client/tunnel compile state
    is the trigger). Process isolation IS the retry. The child shares the
    persistent compile cache, so warm sections cost seconds, not compiles.

    Returns (result, contention, error): error is None on success."""
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), "--section", name,
           *cli_args]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=360)
    except Exception as e:  # noqa: BLE001 — timeout/spawn failure: report
        return None, None, f"subprocess retry: {type(e).__name__}: {e}"[:200]
    for line in reversed((out.stdout or "").strip().splitlines()):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if isinstance(d, dict) and d.get("section") == name:
            r = d.get("result")
            if isinstance(r, list):
                r = tuple(r)
            return r, d.get("contention"), d.get("error")
    tail = (out.stderr or "")[-200:].replace("\n", " ")
    return None, None, (
        f"subprocess retry produced no record (exit {out.returncode}): {tail}"
    )


def _run_sections(specs):
    """Run every section, then RE-QUEUE errored ones at end-of-run — in a
    FRESH SUBPROCESS: round-3's sparse sections died on a transient
    remote-compile HTTP 500 and recorded zeros; round 4 showed the in-process
    re-queue hits the same 500 while a fresh interpreter succeeds, so the
    second chance must be process-isolated (see _retry_in_subprocess)."""
    results, contention = {}, {}
    failed, cli_args = [], {}
    for name, fn, default, kw in specs:
        kw = dict(kw)
        cli_args[name] = tuple(kw.pop("cli_args", ()))
        r, c = _try_section(name, fn, default, **kw)
        results[name], contention[name] = r, c
        if name in _SECTION_ERRORS:
            failed.append((name, default))
    for name, default in failed:
        deadline = _CAL_STATE.get("deadline")
        if deadline is not None and time.monotonic() > deadline:
            break
        first_err = _SECTION_ERRORS.pop(name)
        r, c, err = _retry_in_subprocess(name, cli_args[name])
        if err:
            _SECTION_ERRORS[name] = f"retry: {err}; first: {first_err}"[:300]
            results[name], contention[name] = (
                (r, c) if r is not None else (default, None)
            )
        else:
            results[name], contention[name] = r, c
    # Second end-of-run pass over CONTENDED sections (VERDICT r4 #2): a
    # >1.5x-contended attempt must never be the naked number of record while
    # wall-clock remains. Fresh-subprocess re-runs land in a different
    # tunnel timeslice (the co-tenant bursts are minutes-scale); keep
    # whichever attempt saw the cleaner window. factor 0.0 = poisoned-fast
    # sentinel — also worth one more window.
    order = sorted(
        (n for n, c in contention.items()
         if c is not None and (c == 0.0 or c > 1.5)),
        key=lambda n: -(contention[n] or float("inf")),
    )
    for name in order:
        deadline = _CAL_STATE.get("deadline")
        if deadline is not None and time.monotonic() > deadline:
            break
        r, c, err = _retry_in_subprocess(name, cli_args.get(name, ()))
        if err or r is None or c is None:
            continue
        old_c = contention[name]
        old_rank = float("inf") if old_c == 0.0 else old_c
        new_rank = float("inf") if c == 0.0 else c
        if new_rank < old_rank:
            results[name], contention[name] = r, c
    return results, contention


def _section(fn, retries: int = 1, threshold: float = 1.5,
             fom=None, clean_fom: float = None):
    """Run a bench section bracketed by calibrations, retrying contended
    windows (up to ``retries`` extra attempts, stopping at the whole-bench
    deadline — the driver bounds bench wall-clock; retries are best-effort,
    the annotation is the guarantee).

    TWO contention signals, because the tunnel is timeslice-shared and the
    two fail differently:
    - probe: the HBM-marginal calibration around the section. Catches
      bandwidth co-tenants, but a SHORT probe can land entirely inside our
      timeslice and read clean while the section's long scans absorbed
      co-tenant time (observed: 18.5ms/step "clean at 740 GB/s").
    - result: ``fom(result)`` (seconds-like, smaller=better) against the
      repo's recorded clean-window anchor ``clean_fom``. If the measurement
      is >1.5x the anchor the window was bad no matter what the probe says.
      SYMMETRICALLY, a measurement <0.35x the anchor is not a 3x-faster
      machine, it's a poisoned marginal (a co-tenant burst that lands inside
      the n1 timing subtracts from every pair; with sustained contention the
      median itself goes fast-impossible — observed: 0.285 ms/step recorded
      on a path whose clean time is ~1.6 ms). Incredible-fast attempts are
      retried and never preferred over a credible one; if every attempt is
      incredible the SLOWEST (closest to believable) is kept and the factor
      is annotated 0.0 as a poisoned-window sentinel.
    Keeps the best credible attempt by fom (or by probe factor if no fom).
    Returns (result, contention_factor_of_kept_attempt) where the factor
    folds in max(probe, fom/clean_fom) so recorded numbers carry honest
    context. Genuine kernel speedups >~3x must update the section's anchor
    (clean_fom) or they will be mistaken for poisoning."""
    best = None
    best_key = float("inf")
    best_factor = float("inf")
    best_credible = False

    def cal():
        # a transient tunnel error in the probe must not kill the bench —
        # treat the window as contended (factor folds in the floor) instead
        try:
            return _calibrate()
        except Exception:
            return (_CAL_STATE["min"] or 1.0) * 10.0

    for attempt in range(retries + 1):
        c0 = cal()
        result = fn()
        c1 = cal()
        worst = max(c0, c1)
        factor = worst / max(_CAL_STATE["min"] or worst, 1e-12)
        gbps = _cal_hbm_gbps(worst)
        factor = max(factor, _CLEAN_HBM_GBPS / max(gbps, 1e-9))
        result_ratio = 1.0
        if fom is not None and clean_fom is not None:
            result_ratio = fom(result) / clean_fom
        factor = max(factor, result_ratio)
        credible = result_ratio >= 0.35
        key = fom(result) if fom is not None else factor
        # a credible attempt always beats an incredible one; among credible
        # attempts smaller fom wins; among incredible attempts SLOWER is
        # closer to believable
        if best is None or (credible and not best_credible):
            take = True
        elif credible == best_credible:
            take = key < best_key if credible else key > best_key
        else:
            take = False
        if take:
            best, best_key, best_factor, best_credible = (
                result, key, (factor if credible else 0.0), credible
            )
        clean = (
            credible and factor <= threshold
            and gbps >= _CLEAN_HBM_GBPS and result_ratio <= 1.5
        )
        if clean:
            break
        deadline = _CAL_STATE.get("deadline")
        if deadline is not None and time.monotonic() > deadline:
            break
        if attempt < retries:
            time.sleep(15)  # back off past the co-tenant's burst
    return best, round(best_factor, 2)


def _marginal(run, n1, n2, repeats=5):
    """MEDIAN of positive paired marginal seconds/step between two step counts.

    Every invocation gets a distinct input salt: the tunnel memoizes repeated
    identical executions (CLAUDE.md), which otherwise produces impossible
    (even negative) marginals. Pairing each (n1, n2) timing temporally
    adjacent cancels contention drift. The estimator is the MEDIAN, not the
    min: a paired marginal has a fat LOW tail (any jitter that delays the n1
    timing subtracts from the marginal), so min-of-pairs is biased fast —
    and the _section retry loop, which keeps the best of up to 4 attempts,
    turned that bias into recorded numbers ~1.5x better than the machine
    (observed: 0.99ms/step on a path whose true clean time is ~1.6ms).
    Median is robust to both the low-tail jitter and a single contended
    pair; sustained contention inflates it honestly and is handled by
    _section's retries + annotation."""
    for n in (n1, n2):
        run(n, _next_salt())  # compile + warm
    marginals = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run(n1, _next_salt())
        t1 = time.perf_counter()
        run(n2, _next_salt())
        t2 = time.perf_counter()
        m = ((t2 - t1) - (t1 - t0)) / (n2 - n1)
        if m > 0:
            marginals.append(m)
    if not marginals:
        return float("nan")
    marginals.sort()
    return marginals[len(marginals) // 2]



def _to_default_device(tree):
    """Move a pytree to the default (TPU) device: arrays created under the
    host-CPU build pass are COMMITTED to CPU, and jit would otherwise run the
    whole computation there."""
    dev = jax.devices()[0]
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, dev), tree)


# ---------------------------------------------------------------------------
def bench_two_tower_compute(policy: str = "float32", opt_state_dtype=None):
    """Training step compute throughput: loop inside lax.scan on one batch.

    ``opt_state_dtype="bfloat16"`` benches the bf16-at-rest optimizer slots
    (the dense-adagrad step is HBM-bound; halving slot width cuts the state
    share of traffic 2x — trajectory-parity tested in test_optimizers.py)."""
    import optax
    from flax import nnx

    from models_tpu.core.policy import set_dtype_policy

    set_dtype_policy(policy)

    from models_tpu.core.block import call_block
    from models_tpu.core.types import ModelContext, to_device_batch
    from models_tpu.data import Loader, generate_data
    from models_tpu.models import TwoTowerModel

    ds = generate_data("movielens-25m", num_rows=BATCH, seed=3)
    # eager build on host CPU (each eager op is a tunnel RTT on the TPU)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        model = TwoTowerModel(ds.schema, query_tower=(256, 128), embedding_dim=128)
        model.compile(
            optimizer="adagrad", learning_rate=0.05,
            optimizer_state_dtype=opt_state_dtype,
        )
        loader = Loader(ds, batch_size=BATCH, drop_last=True)
        model.build(loader)

    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    params, rest = _to_default_device(params), _to_default_device(rest)
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
            context["need_logits"] = False  # fused blockwise CE path
            preds = call_block(mod, x, targets=y, training=True, context=context)
            pred_dict = mod._as_pred_dict(preds)
            total, _ = mod._compute_losses(pred_dict, x, loss_fns)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def run(n, salt):
        @jax.jit
        def go(params, opt_state, salt):
            (_, _), losses = jax.lax.scan(train_step, (params, opt_state), None, length=n)
            return losses[-1] + salt  # salt defeats tunnel memoization

        return float(go(params, opt_state, jnp.float32(salt)))

    try:
        step_time = _marginal(run, N1, N2)
        flops_step = _train_flops_per_step(train_step, params, opt_state)
    finally:
        set_dtype_policy("float32")
    param_bytes = sum(
        int(np.prod(jnp.shape(getattr(l, "value", l)))) * 4
        for l in jax.tree_util.tree_leaves(params)
    )
    return BATCH / step_time, step_time * 1000, param_bytes, flops_step


# ---------------------------------------------------------------------------
def bench_two_tower_pipeline(policy: str = "mixed_bfloat16", opt_state_dtype=None):
    """End-to-end fit() throughput: parquet → Loader → device-resident columns
    → one compiled dispatch per epoch. Runs the same dtype policy as the
    compute headline (apples-to-apples).

    steps_per_execution covers the whole epoch: with the dataset columns
    resident in HBM the only per-epoch host work is ONE dispatch (~1 RTT) and
    ONE stacked scalar fetch (~1 RTT) — the remaining gap to compute-only
    throughput is published in the breakdown extras."""
    from models_tpu.core.policy import set_dtype_policy
    from models_tpu.core.types import to_device_batch
    from models_tpu.data import Dataset, Loader, generate_data
    from models_tpu.models import TwoTowerModel

    set_dtype_policy(policy)
    if not os.path.isdir(BENCH_DATA):
        os.makedirs(os.path.dirname(BENCH_DATA), exist_ok=True)
        ds = generate_data("movielens-25m", num_rows=BATCH * PIPE_BATCHES, seed=3)
        ds.to_parquet(BENCH_DATA, num_partitions=8)
    ds = Dataset.from_parquet(BENCH_DATA)
    model = TwoTowerModel(ds.schema, query_tower=(256, 128), embedding_dim=128)
    # metrics off the hot path (reference MetricsComputeCallback semantics)
    model.compile(
        optimizer="adagrad",
        learning_rate=0.05,
        optimizer_state_dtype=opt_state_dtype,
        metrics=[],  # metrics off the hot path AND enables full-fit fusion
        train_metrics_steps=10_000,
        steps_per_execution=PIPE_BATCHES,
    )
    loader = Loader(ds, batch_size=BATCH, drop_last=True, shuffle=False)
    breakdown = {}
    # host parquet decode + ragged padding (one-time; cached across epochs)
    t0 = time.perf_counter()
    feats_h, targs_h, n_rows = loader.dense_columns()
    breakdown["host_decode_s"] = round(time.perf_counter() - t0, 3)
    nbytes = sum(
        a.nbytes for a in jax.tree_util.tree_leaves((feats_h, targs_h))
        if hasattr(a, "nbytes")
    )
    breakdown["dataset_mb"] = round(nbytes / 2**20, 1)
    # one-time host→device upload over the ~40MB/s tunnel
    t0 = time.perf_counter()
    dev = jax.tree_util.tree_map(jnp.asarray, (feats_h, targs_h))
    jax.block_until_ready(dev)
    breakdown["upload_s"] = round(time.perf_counter() - t0, 3)
    del dev
    # the fused full-fit path runs all epochs in ONE dispatch, so the first
    # fit's wall is dominated by compile; warm it, then measure a second fit
    # (same shapes -> executable cache hit; upload is outside the fused timer)
    try:
        model.fit(loader, epochs=6, verbose=0)
        hist = model.fit(loader, epochs=6, verbose=0)
    finally:
        set_dtype_policy("float32")
    eps = float(max(hist.history["examples_per_sec"]))
    breakdown["epoch_wall_ms"] = round(1000.0 * BATCH * PIPE_BATCHES / eps, 1)
    breakdown["steps_per_epoch"] = PIPE_BATCHES
    return eps, breakdown


def bench_session_bucket_pipeline():
    """End-to-end session-transformer fit() with ``pad="bucket"`` through the
    per-group device-resident fused path (VERDICT r3 #4): 64k variable-length
    sessions bucketed into four pow2 length groups (8/16/32/64), one fused
    multi-step dispatch per group per epoch. Reports sessions/sec and the
    per-group layout."""
    import numpy as np
    import pyarrow as pa

    from models_tpu.data import Dataset, Loader
    from models_tpu.models.session import SessionBasedTransformerModel
    from models_tpu.schema import Schema, Tags, create_categorical_column
    from models_tpu.transformer.block import GPT2Block
    from models_tpu.transforms.sequence import SequencePredictNext

    B = 1024
    per_group = 16 * B  # 16 full batches per bucket group
    rng = np.random.default_rng(11)
    # all four pow2 groups incl. 64 (VERDICT r4 #4): the flash-CE path streams
    # the (B*L, B*L) in-batch logits so HBM stays O(B*L*D); the old 64-bucket
    # OOM was the EAGER build pass materializing the full matrix, fixed in r5
    # by building on a thin row slice (models/base._slice_build_batch).
    # Bucket 64's step is quadratic-compute (65k x 65k logit tiles ~ 1.1
    # TFLOP/pass) — real work, not a pathology.
    lengths = np.concatenate([
        rng.integers(5, 9, per_group),      # bucket 8
        rng.integers(9, 17, per_group),     # bucket 16
        rng.integers(17, 33, per_group),    # bucket 32
        rng.integers(33, 65, per_group),    # bucket 64
    ])
    rng.shuffle(lengths)
    n = len(lengths)
    total = int(lengths.sum())
    values = rng.integers(1, 10_000, total).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    sessions = pa.ListArray.from_arrays(pa.array(offsets), pa.array(values))
    schema = Schema([
        create_categorical_column(
            "item_id_seq", 10_000, tags=(Tags.ITEM, Tags.ITEM_ID, Tags.SEQUENCE),
            is_list=True, max_seq_length=64,
        ),
    ])
    ds = Dataset(pa.table({"item_id_seq": sessions}), schema=schema)

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        model = SessionBasedTransformerModel(
            ds.schema,
            transformer=GPT2Block(d_model=128, n_head=8, n_layer=2, dropout=0.0),
            embedding_dim=128,
        )
        model.compile(
            optimizer="adam", learning_rate=1e-3, metrics=[],
            train_metrics_steps=10_000, steps_per_execution=16,
        )
    loader = Loader(ds, batch_size=B, pad="bucket", drop_last=True, shuffle=False)
    pre = SequencePredictNext(ds.schema, target="item_id_seq")
    # warm (compile one fused chunk per bucket group), then measure
    model.fit(loader, epochs=1, verbose=0, pre=pre)
    hist = model.fit(loader, epochs=2, verbose=0, pre=pre)
    eps = float(max(hist.history["examples_per_sec"]))
    step_ms = 1000.0 * B / max(eps, 1e-9)
    return eps, step_ms


# ---------------------------------------------------------------------------
def bench_dlrm_compute():
    """DLRM CTR training step on the criteo layout (13 dense + 26 categorical,
    dot interactions, batch 8192) — the reference's main ranking workload."""
    import optax
    from flax import nnx

    from models_tpu.core.block import call_block
    from models_tpu.core.types import ModelContext, to_device_batch
    from models_tpu.data import Loader, generate_data
    from models_tpu.models import DLRMModel

    ds = generate_data("criteo-small", num_rows=BATCH, seed=5)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        model = DLRMModel(
            ds.schema, embedding_dim=64, bottom_block=(256, 64), top_block=(256, 128)
        )
        model.compile(optimizer="adagrad", learning_rate=0.05)
        loader = Loader(ds, batch_size=BATCH, drop_last=True)
        model.build(loader)

    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    params, rest = _to_default_device(params), _to_default_device(rest)
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
            context["need_logits"] = False
            preds = call_block(mod, x, targets=y, training=True, context=context)
            pred_dict = mod._as_pred_dict(preds)
            total, _ = mod._compute_losses(pred_dict, x, loss_fns)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def run(n, salt):
        @jax.jit
        def go(params, opt_state, salt):
            (_, _), losses = jax.lax.scan(train_step, (params, opt_state), None, length=n)
            return losses[-1] + salt

        return float(go(params, opt_state, jnp.float32(salt)))

    step_time = _marginal(run, N1, N2)
    flops_step = _train_flops_per_step(train_step, params, opt_state)
    param_bytes = sum(
        a.size * a.dtype.itemsize for a in jax.tree_util.tree_leaves(params)
    )
    return BATCH / step_time, step_time * 1000, param_bytes, flops_step


# ---------------------------------------------------------------------------
def bench_session_transformer():
    """Session-based transformer training step (GPT2-style causal next-item,
    d_model=128, 2 layers, L=20, batch 1024, in-batch sampled softmax over all
    positions) — the reference's example-08 workload."""
    import optax
    from flax import nnx

    from models_tpu.core.block import call_block
    from models_tpu.core.types import ModelContext, to_device_batch
    from models_tpu.data import Loader, generate_data
    from models_tpu.models.session import SessionBasedTransformerModel
    from models_tpu.transformer.block import GPT2Block
    from models_tpu.transforms.sequence import SequencePredictNext

    B = 1024
    ds = generate_data("sequence-testing", num_rows=B, seed=7)
    # construct + eager-build on the HOST CPU backend: the build pass runs
    # hundreds of tiny eager ops, each a tunnel RTT on the TPU (minutes);
    # jit moves the params to the TPU on first compiled call
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        model = SessionBasedTransformerModel(
            ds.schema,
            transformer=GPT2Block(d_model=128, n_head=8, n_layer=2, dropout=0.0),
            embedding_dim=128,
        )
        model.compile(optimizer="adam", learning_rate=1e-3)
        loader = Loader(ds, batch_size=B, drop_last=True)
        model.build(loader)
    pre = SequencePredictNext(ds.schema, target="item_id_seq")
    x_host, y_host = loader.peek()
    x_host, y_host = pre(x_host, targets=y_host)
    x = to_device_batch(x_host)
    y = jax.tree_util.tree_map(jnp.asarray, y_host)

    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    params, rest = _to_default_device(params), _to_default_device(rest)
    x, y = _to_default_device(x), _to_default_device(y)
    tx = model._tx
    opt_state = tx.init(params)
    loss_fns = model._resolve_task_losses()

    def train_step(carry, _):
        params, opt_state = carry

        def loss_fn(p):
            mod = nnx.merge(graphdef, p, rest)
            context = ModelContext(features=x, targets=y, step=0)
            context["need_logits"] = False
            preds = call_block(mod, x, targets=y, training=True, context=context)
            pred_dict = mod._as_pred_dict(preds)
            total, _ = mod._compute_losses(pred_dict, x, loss_fns)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def run(n, salt):
        @jax.jit
        def go(params, opt_state, salt):
            (_, _), losses = jax.lax.scan(train_step, (params, opt_state), None, length=n)
            return losses[-1] + salt

        return float(go(params, opt_state, jnp.float32(salt)))

    # wide step spread: sub-ms steps need (n2-n1)*step >> tunnel jitter
    step_time = _marginal(run, 4, 64)
    flops_step = _train_flops_per_step(train_step, params, opt_state, n=64)
    return B / step_time, step_time * 1000, flops_step


# ---------------------------------------------------------------------------
def bench_topk():
    """Production top-k dispatch (exact binned two-phase kernel, Pallas
    fallback) over a 1M x 128 catalog, B=256, k=10 (+ index build)."""
    from models_tpu.ops.topk import topk_scores

    C, D, B, K = 1_000_000, 128, 256, 10
    cand = jax.random.normal(jax.random.key(0), (C, D), jnp.float32)
    # production path (BruteForce.index): pad to a bin multiple ONCE at build
    # time so the serving trace consumes the matrix exactly once (any in-trace
    # tail handling forces a full-matrix copy, +1.4 ms — r5)
    from models_tpu.ops.topk import _BINNED_BIN_SIZE

    pad = (-C) % _BINNED_BIN_SIZE
    cand = jnp.pad(cand, ((0, pad), (0, 0)))
    item_feats = jax.random.normal(jax.random.key(1), (C, 64), jnp.float32)
    w1 = jax.random.normal(jax.random.key(2), (64, 128), jnp.float32) * 0.1
    w2 = jax.random.normal(jax.random.key(3), (128, D), jnp.float32) * 0.1

    def make_query_sweep(cand_arr):
        def run_queries(n, salt):
            @jax.jit
            def go(cand, salt):
                def body(carry, t):
                    # fresh queries each step + per-call salt (tunnel memoization)
                    q = jax.random.normal(
                        jax.random.fold_in(jax.random.key(7), t), (B, D)
                    ) + carry * 0
                    s, i = topk_scores(q, cand, K, tile=4096, n_valid=C)
                    return carry + jnp.sum(s[:, 0].astype(jnp.float32)) * 1e-12, i

                c, ids = jax.lax.scan(body, salt, jnp.arange(n))
                return ids[-1, 0, 0] + c

            return float(go(cand_arr, jnp.float32(salt)))

        return run_queries

    q_time = _marginal(make_query_sweep(cand), 2, 22)
    # bf16 index: the exact same dispatch over a half-width candidate matrix
    # (phase A streams the catalog, so ideal speedup approaches 2x)
    q_time_bf16 = _marginal(make_query_sweep(cand.astype(jnp.bfloat16)), 2, 22)
    # int8 BIN-QUANTIZED index (BruteForce.index(dtype=int8)): 1-byte catalog
    # stream, int8 x int8 MXU dots, one scale per bin so phase A reduces in
    # int32 inside the conv fusion (per-row scales force a 1 GB dequant copy)
    amax = jnp.max(jnp.abs(cand), axis=1)
    bin_amax = amax.reshape(-1, _BINNED_BIN_SIZE).max(axis=1)
    bin_scale = jnp.where(bin_amax > 0, bin_amax, 1.0) / 127.0
    scales = jnp.repeat(bin_scale, _BINNED_BIN_SIZE)
    ci8 = jnp.clip(jnp.round(cand / scales[:, None]), -127, 127).astype(jnp.int8)

    def make_int8_sweep():
        def run_queries(n, salt):
            @jax.jit
            def go(cand_i8, sc, salt):
                def body(carry, t):
                    q = jax.random.normal(
                        jax.random.fold_in(jax.random.key(7), t), (B, D)
                    ) + carry * 0
                    s, i = topk_scores(q, cand_i8, K, tile=4096, n_valid=C,
                                       col_scale=sc, col_scale_per_bin=True)
                    return carry + jnp.sum(s[:, 0].astype(jnp.float32)) * 1e-12, i

                c, ids = jax.lax.scan(body, salt, jnp.arange(n))
                return ids[-1, 0, 0] + c

            return float(go(ci8, scales, jnp.float32(salt)))

        return run_queries

    q_time_int8 = _marginal(make_int8_sweep(), 2, 22)

    def run_build(n, salt):
        @jax.jit
        def go(feats, salt):
            def body(carry, t):
                emb = jnp.maximum((feats + carry * 0) @ w1, 0.0) @ w2
                return carry + emb[0, 0] * 1e-9, ()

            c, _ = jax.lax.scan(body, salt, jnp.arange(n))
            return c

        return float(go(item_feats, jnp.float32(salt)))

    build_time = _marginal(run_build, 1, 4)
    return (B / q_time, q_time * 1000, build_time * 1000,
            q_time_bf16 * 1000, q_time_int8 * 1000)


# ---------------------------------------------------------------------------
def bench_sparse_optimizer():
    """Row-sparse (Pallas scatter) vs dense adagrad at catalog scale.

    Head-to-head at 4M x 128 (dense at 8M x 128 exceeds HBM: the dense path
    needs table + slot + dense grad + temps ≈ 19G > 15.75G — the sparse path is
    the only way to *train* an 8M-row table on one chip at all). The bf16
    variant stores the TABLE bfloat16 with stochastic-rounding writes (fp32
    slots): half the table HBM, so 16M x 128 trains on one chip."""
    from models_tpu.ops.scatter import (
        dedup_rows,
        pallas_row_scatter_add,
        pallas_row_scatter_write,
        stochastic_round,
    )

    D, B = 128, 8192
    lr, eps = 0.05, 1e-8

    def make(step_kind, R):
        def sparse_step(carry, t):
            w, acc = carry
            ids = jax.random.randint(jax.random.fold_in(jax.random.key(5), t), (B,), 0, R)
            g = jnp.full((B, D), 1e-6) * (1.0 + w[0, 0])
            sids, gsum, valid = dedup_rows(ids, g)
            acc_new_rows = jnp.take(acc, sids, axis=0) + gsum * gsum
            acc = pallas_row_scatter_add(acc, sids, gsum * gsum, valid)
            w = pallas_row_scatter_add(
                w, sids, -lr * gsum / (jnp.sqrt(acc_new_rows) + eps), valid
            )
            return (w, acc), ()

        def dense_step(carry, t):
            w, acc = carry
            ids = jax.random.randint(jax.random.fold_in(jax.random.key(5), t), (B,), 0, R)

            def loss(w):
                return jnp.sum(jnp.take(w, ids, axis=0)) * 1e-6

            g = jax.grad(loss)(w)  # dense via gather-backward (the round-1 path)
            acc = acc + g * g
            w = w - lr * g / (jnp.sqrt(acc) + eps)
            return (w, acc), ()

        def bf16_sparse_step(carry, t):
            w, acc = carry  # w: bf16 table, acc: fp32 slots
            ids = jax.random.randint(jax.random.fold_in(jax.random.key(5), t), (B,), 0, R)
            g = jnp.full((B, D), 1e-6) * (1.0 + w[0, 0].astype(jnp.float32))
            sids, gsum, valid = dedup_rows(ids, g)
            acc_new_rows = jnp.take(acc, sids, axis=0) + gsum * gsum
            acc = pallas_row_scatter_add(acc, sids, gsum * gsum, valid)
            old = jnp.take(w, sids, axis=0).astype(jnp.float32)
            rows = stochastic_round(
                old - lr * gsum / (jnp.sqrt(acc_new_rows) + eps),
                jax.random.fold_in(jax.random.key(9), t),
            )
            w = pallas_row_scatter_write(w, sids, rows, valid)
            return (w, acc), ()

        step_fn = {
            "sparse": sparse_step, "dense": dense_step, "bf16": bf16_sparse_step
        }[step_kind]
        w_dtype = jnp.bfloat16 if step_kind == "bf16" else jnp.float32

        def run(n, salt):
            @partial(jax.jit, donate_argnums=(0, 1))
            def go(w, acc):
                (w, acc), _ = jax.lax.scan(step_fn, (w, acc), jnp.arange(n))
                return w, acc, w[0, 0].astype(jnp.float32)

            # the final carries MUST be outputs: donation can only alias
            # inputs to OUTPUTS, so a scalar-only return makes XLA keep the
            # 12G args alive AND double-buffer the scan carries as temps —
            # measured 22.9G peak for the 16Mx128 bf16 step (OOM) vs 12G
            # when the loop runs in the donated buffers. Only the scalar is
            # fetched; w/acc stay on device and free on Python drop.
            # salt must survive in the inputs: bf16 quantizes salt*1e-12 to
            # IDENTICAL values for adjacent salts (tunnel memoization would
            # poison the marginal), so it also rides the fp32 slot init
            _, _, s = go(
                jnp.full((R, D), salt * 1e-12, w_dtype),
                jnp.full((R, D), 0.1 + salt * 1e-5, jnp.float32),
            )
            return float(s)

        return run

    # sparse steps are sub-ms: spread the step counts far apart so the marginal
    # rises above tunnel jitter. Each sub-bench is isolated: one failing
    # variant (e.g. a compile error at the 16M scale) must not discard the
    # numbers the others already produced (round-4 lesson: every fp32 sparse
    # number was lost to the bf16 section's OOM).
    def _try(kind, R, n1, n2):
        try:
            return _marginal(make(kind, R), n1, n2) * 1000
        except Exception as e:  # noqa: BLE001
            _SECTION_ERRORS[f"sparse_opt/{kind}_{R}"] = f"{type(e).__name__}: {e}"[:300]
            print(f"# sparse_opt sub-bench {kind}@{R} FAILED: {e}", file=sys.stderr)
            return None

    sparse_4m = _try("sparse", SPARSE_R_MAIN, 2, 202)
    dense_4m = _try("dense", SPARSE_R_MAIN, 2, 12)
    sparse_8m = _try("sparse", SPARSE_R_BIG, 2, 202)
    # bf16 table + SR: half the table HBM — 16M x 128 is untrainable any other
    # way on one chip (fp32 sparse caps at ~8M, dense at ~4M)
    bf16_16m = _try("bf16", SPARSE_R_BF16, 2, 202)
    return sparse_4m, dense_4m, sparse_8m, bf16_16m


# ---------------------------------------------------------------------------
# nominal peak HBM bandwidth of the bench device (TPU v5e), for roofline context
V5E_HBM_GBPS = 819.0
# MXU peak (bf16); JAX's DEFAULT matmul precision on TPU runs f32 operands as
# single-pass bf16 on the MXU, so this is the right compute ceiling for every
# training section regardless of declared dtype policy
V5E_MXU_BF16_FLOPS = 197e12


def _train_flops_per_step(train_step, params, opt_state, n: int = None):
    """XLA-reported FLOPs for ONE training step, from ``cost_analysis()`` of
    the same scan executable the section timed (the axon remote compiler
    serves cost analysis; 'bytes accessed' is pre-fusion HLO accounting and
    must NOT be used as an HBM-traffic estimate).

    Two measured semantics to respect (probed on this backend):
    - the reported 'flops' counts the while-loop BODY ONCE regardless of trip
      count (verified: identical for length=8 and length=32 scans of a known
      matmul) — so the raw number already IS per-step; do not divide by n.
    - custom calls are opaque: Pallas kernels contribute ZERO flops, so
      sections whose math lives in Pallas (two-tower flash-CE) undercount and
      must anchor their roofline on the HBM traffic model instead (the max()
      in _roofline does this automatically).

    The jitted fn below is structurally identical to each section's ``run``
    closure, so lowering it is a persistent-compile-cache hit, not a fresh
    ~60s tunnel compile."""
    n = n or N2

    @jax.jit
    def go(params, opt_state, salt):
        (_, _), losses = jax.lax.scan(train_step, (params, opt_state), None, length=n)
        return losses[-1] + salt

    try:
        d = go.lower(params, opt_state, jnp.float32(0.0)).compile().cost_analysis()
        if isinstance(d, (list, tuple)):
            d = d[0]
        f = float(d.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _require_device(timeout_s: float = 180.0) -> None:
    """Fail fast with a well-formed JSON line when the TPU tunnel is down.

    Outages make ``jax.devices()`` HANG (no error), which would wedge the
    whole bench run past any wall bound. Probe it on a daemon thread and emit
    an explicit error record if it never answers."""
    import threading

    got, err = [], []

    def _probe():
        try:
            got.append(jax.devices())
        except Exception as e:  # noqa: BLE001 - re-raised on the main thread
            err.append(e)

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if got:
        return
    if err:
        raise err[0]  # real backend/config error — surface it, don't call it an outage
    print(
        json.dumps(
            {
                "metric": "two_tower_train_examples_per_sec",
                "value": 0.0,
                "unit": "examples/sec",
                "vs_baseline": 0.0,
                "extra": {
                    "error": f"TPU backend unreachable within {timeout_s:.0f}s "
                    "(axon tunnel outage — jax.devices() hung); no measurements taken",
                    "last_valid_chip_record": "BENCH_r02.json (same code paths; "
                    "see docs/BENCHMARKS.md for clean-window methodology)",
                },
            }
        )
    )
    sys.exit(0)


def _arm_wall_watchdog(limit_s: float = 1500.0, record: dict = None) -> None:
    """The tunnel can hang MID-RUN (not just at startup): after ``limit_s``
    emit an explicit error record and hard-exit so the driver records a JSON
    line instead of a stall. Normal runs finish well inside the limit (warm
    ~20s, cold compiles a few minutes). ``record`` overrides the emitted
    JSON shape (section mode emits a section record the parent can parse)."""
    import os
    import threading

    def _fire():
        print(
            json.dumps(
                record
                or {
                    "metric": "two_tower_train_examples_per_sec",
                    "value": 0.0,
                    "unit": "examples/sec",
                    "vs_baseline": 0.0,
                    "extra": {
                        "error": f"bench exceeded {limit_s:.0f}s wall clock "
                        "(TPU tunnel hang mid-run); partial sections discarded"
                    },
                }
            ),
            flush=True,
        )
        os._exit(0)

    t = threading.Timer(limit_s, _fire)
    t.daemon = True
    t.start()


def _configure_compile_cache():
    # persistent compile cache: repeat bench runs (and subprocess section
    # retries) skip the ~60s TPU compiles
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _main_specs():
    # clean_fom anchors = CLAUDE.md clean-window step times (seconds); a
    # result >1.5x its anchor triggers retry-with-backoff even when the
    # short probe read clean (timeslice co-tenancy — see _section docstring)
    return [
        ("two_tower_fp32", bench_two_tower_compute, None,
         dict(retries=3, fom=lambda r: r[1], clean_fom=1.8)),
        ("two_tower_bf16", lambda: bench_two_tower_compute("mixed_bfloat16"),
         None, dict(retries=3, fom=lambda r: r[1], clean_fom=1.8)),
        # third production config: bf16-at-rest optimizer slots on top of the
        # bf16 policy (both knobs trajectory-parity tested) — the adagrad
        # phase is HBM-bound so halving slot width is a direct step-time cut
        ("two_tower_bf16_state",
         lambda: bench_two_tower_compute("mixed_bfloat16", opt_state_dtype="bfloat16"),
         None, dict(retries=2, fom=lambda r: r[1], clean_fom=1.6)),
        # clean anchor 1.0: chip-validated 2026-08-19 same-window A/B — fused
        # tiered embeddings (the DLRMBlock default) measured 0.944 ms/step vs
        # 3.163 unfused in ONE 718 GB/s window (3.35x; other paired windows
        # 2.4-4.2x). The old 1.6 anchor was the pre-fusion step time and
        # would let 1.7x-contended fused windows pass as credible.
        ("dlrm", bench_dlrm_compute, None,
         dict(retries=2, fom=lambda r: r[1], clean_fom=1.0)),
        # anchor 1.5: verified clean-window measurement (2026-08-19, campaign
        # run at contention 1.02: 1.502 ms = 682k sessions/s); the old 2.0
        # anchor was itself a contended-era estimate
        ("session", bench_session_transformer, None,
         dict(fom=lambda r: r[1], clean_fom=1.5, retries=2)),
        # anchor 16: the r5 4-group config (buckets 8/16/32/64) measured 23.3
        # ms avg step in an uncharacterized window; the 64-group's in-batch CE
        # is quadratic (65k x 65k logit tiles ~ 3.3 TFLOP/step incl. backward
        # = 17 ms at MXU peak), so the average step is dominated by real work
        ("session_bucket", bench_session_bucket_pipeline, None,
         dict(fom=lambda r: r[1], clean_fom=16.0)),
        # fom folds in BOTH sweeps (bf16 normalized to the fp32 anchor scale)
        # — round-4 lesson: a window can read clean on the fp32 sweep yet
        # poison the later bf16 sweep 12x; checking only r[1] recorded the
        # poisoned number without retry. r5 anchors: padded single-consumer
        # index + lax.top_k selection + bin_size 64 measured fp32 1.23 /
        # bf16 0.93 ms (3.1x/2.2x the r4 kernel; consistent across two
        # windows)
        ("topk", bench_topk, None,
         dict(retries=2,
              fom=lambda r: max(r[1], r[3] * (1.25 / 0.95),
                                r[4] * (1.25 / 0.65)),
              clean_fom=1.25)),
        ("sparse_opt", bench_sparse_optimizer, None,
         # r[0] (sparse 4M ms) anchors the window check; a failed sub-bench
         # yields None -> inf marks the attempt non-credible without crashing
         dict(fom=lambda r: float("inf") if r[0] is None else r[0],
              clean_fom=1.6)),
    ]


def _pipeline_spec(policy, opt_state_dtype):
    return (
        "pipeline",
        lambda: bench_two_tower_pipeline(
            policy=policy, opt_state_dtype=opt_state_dtype
        ),
        None,
        dict(fom=lambda r: BATCH * PIPE_BATCHES / max(r[0], 1.0), clean_fom=0.40,
             cli_args=("--policy", policy or "float32",
                       *(("--opt-state", opt_state_dtype)
                         if opt_state_dtype else ()))),
    )


def main():
    _require_device()
    _arm_wall_watchdog()
    _configure_compile_cache()

    # retries stop once the bench has been running ~8 min (driver wall bound)
    _CAL_STATE["deadline"] = time.monotonic() + 480
    specs = _main_specs()
    results, contention = _run_sections(specs)
    examples_per_sec, step_ms, param_bytes, tt_flops = (
        results["two_tower_fp32"] or (None,) * 4
    )
    eps_bf16, step_ms_bf16, _, tt_flops_bf16 = results["two_tower_bf16"] or (None,) * 4
    eps_bf16s, step_ms_bf16s, _, tt_flops_bf16s = (
        results["two_tower_bf16_state"] or (None,) * 4
    )
    dlrm_eps, dlrm_ms, dlrm_param_bytes, dlrm_flops = results["dlrm"] or (None,) * 4
    sess_eps, sess_ms, sess_flops = results["session"] or (None, None, None)
    sb_eps, sb_ms = results["session_bucket"] or (None, None)
    _topk_res = results["topk"] or (None,) * 5
    if len(_topk_res) == 4:  # resumed/legacy 4-tuple (pre-int8 sweep)
        _topk_res = tuple(_topk_res) + (None,)
    topk_qps, topk_ms, build_ms, topk_ms_bf16, topk_ms_int8 = _topk_res
    sparse_4m, dense_4m, sparse_8m, bf16_16m = results["sparse_opt"] or (None,) * 4

    candidates_early = [
        (examples_per_sec or 0.0, ("float32", None)),
        (eps_bf16 or 0.0, ("mixed_bfloat16", None)),
        (eps_bf16s or 0.0, ("mixed_bfloat16", "bfloat16")),
    ]
    best_policy_early, best_state_early = max(candidates_early, key=lambda t: t[0])[1]
    # pipeline section runs after the headline choice is known (it reuses the
    # fastest trajectory-tested policy); it participates in the same re-queue
    # discipline via its own spec list
    pipe_results, pipe_cont = _run_sections(
        [_pipeline_spec(best_policy_early, best_state_early)]
    )
    contention.update(pipe_cont)
    pipeline_eps, pipe_breakdown = pipe_results["pipeline"] or (None, {})

    def _r(x, nd=3):
        """Round, passing through None (errored section → JSON null, not 0.0:
        round-3's zeros were mistaken for measurements)."""
        return None if x is None else round(x, nd)

    def _clean_ms(ms, section):
        """Best-credible estimate of the clean-window value for a measured ms
        (VERDICT r4 #2): measured / contention when the kept attempt ran
        contended (factor > 1.5). factor 0.0 (poisoned-fast sentinel) and
        None (errored) give no credible estimate. Slightly-contended
        (1 < c <= 1.5) measurements stand as recorded."""
        c = contention.get(section)
        if ms is None or c is None or c == 0.0:
            return ms if (c is not None and c != 0.0) else None
        return ms / c if c > 1.5 else ms

    # headline = the fastest production config (all three trajectory-tested);
    # every variant recorded in extras
    best_eps, (best_policy, best_state) = max(candidates_early, key=lambda t: t[0])
    if best_state is not None:
        best_policy = f"{best_policy}+bf16_state"
    best_step_s = max({
        "float32": step_ms or 0.0, "mixed_bfloat16": step_ms_bf16 or 0.0,
        "mixed_bfloat16+bf16_state": step_ms_bf16s or 0.0,
    }[best_policy] / 1000, 1e-9)
    # roofline context: dense-adagrad two-tower traffic ~ 6x param bytes/step
    # (read+write of weights and accumulators + grad materialization); bf16
    # slots halve the accumulator share (6x -> 5x). The step is HBM-bound
    # (CLAUDE.md decomposition), so this estimates BW%
    est_traffic = (5.0 if best_state is not None else 6.0) * (param_bytes or 0)
    hbm_pct = 100.0 * est_traffic / best_step_s / (V5E_HBM_GBPS * 1e9)
    # per-section roofline (VERDICT r3 #1/#7): achieved vs the catalog-stream
    # bound at the session's CALIBRATED clean rate (not nominal): top-k phase A
    # must stream the full candidate matrix once; phase B re-reads the selected
    # bins (~2% extra). The reported pct is achieved/(1-pass bound) — 100%
    # means the kernel runs at memcpy speed over the index.
    cal_gbps = _cal_hbm_gbps(_CAL_STATE["min"]) if _CAL_STATE["min"] else None
    topk_catalog_gb_fp32 = 1_000_000 * 128 * 4 / 1e9
    def _topk_roofline(ms, passes, dtype_bytes):
        if not ms or not cal_gbps:
            return None
        bound_ms = passes * topk_catalog_gb_fp32 * (dtype_bytes / 4) / cal_gbps * 1e3
        return round(100.0 * bound_ms / ms, 1)

    def _hbm_roofline(traffic_bytes, ms):
        """Achieved pct of the session's CALIBRATED stream rate implied by a
        section's estimated HBM traffic — 100% = the step moves its bytes at
        memcpy speed (every HBM-bound section's honest speed-of-light)."""
        if not ms or not cal_gbps or not traffic_bytes:
            return None
        return round(100.0 * (traffic_bytes / (ms / 1e3)) / (cal_gbps * 1e9), 1)

    def _roofline(ms, traffic_bytes=None, flops=None):
        """Achieved pct vs the TIGHTER of the two per-step bounds: the
        HBM-traffic model at the calibrated stream rate and the XLA-reported
        FLOPs at MXU bf16 peak. 100% = the step runs at the binding resource's
        speed of light; reporting vs the looser bound alone overstated the
        headroom for compute-bound sections (round-4 fix: DLRM read 1.2% on a
        traffic model when the step is actually gather/glue-bound)."""
        if not ms:
            return None
        bounds = []
        if traffic_bytes and cal_gbps:
            bounds.append(traffic_bytes / (cal_gbps * 1e9) * 1e3)
        if flops:
            bounds.append(flops / V5E_MXU_BF16_FLOPS * 1e3)
        if not bounds:
            return None
        return round(100.0 * max(bounds) / ms, 1)

    # per-section roofline ratios (VERDICT r3 #7). Bound models:
    # - two_tower/dlrm/session: max(HBM traffic model, XLA cost_analysis FLOPs
    #   at MXU bf16 peak). Traffic model: dense-adagrad training moves ~6x
    #   param bytes/step (w+acc read/write + grad materialization); bf16 slots
    #   drop the acc share (6x -> 5x). A LOW pct on both axes means the step is
    #   bound by neither stream — gathers/glue/fixed costs (DLRM's case).
    # - sparse_opt: the MINIMAL traffic is just the touched rows (gather+RMW of
    #   w and acc + grad rows ~ 7 row-array passes) — the tiny pct is the
    #   point: the kernel is sort/dedup/dispatch fixed-cost-bound, NOT
    #   HBM-bound, which is why dense wins below the ~1M-row crossover.
    # - topk: 1-pass stream of the candidate matrix (exact kernels must look
    #   at every candidate once).
    sparse_row_bytes = 7 * BATCH * 128 * 4
    best_flops = {
        "float32": tt_flops, "mixed_bfloat16": tt_flops_bf16,
        "mixed_bfloat16+bf16_state": tt_flops_bf16s,
    }.get(best_policy)
    # roofline ratios are computed on the BEST-CREDIBLE (clean-estimated)
    # step times, not the kept contended attempt (VERDICT r4 #2: a ratio on a
    # 3x-poisoned denominator tells the reader the kernel is 10x off when it
    # is 1.4x off). clean_estimate_ms below records the same estimates.
    headline_section = {
        "float32": "two_tower_fp32", "mixed_bfloat16": "two_tower_bf16",
        "mixed_bfloat16+bf16_state": "two_tower_bf16_state",
    }[best_policy]
    roofline_pct = {
        "two_tower_headline": _roofline(
            _clean_ms(best_step_s * 1e3, headline_section),
            traffic_bytes=est_traffic, flops=best_flops,
        ),
        "dlrm": _roofline(
            _clean_ms(dlrm_ms, "dlrm"),
            traffic_bytes=6.0 * (dlrm_param_bytes or 0), flops=dlrm_flops,
        ),
        "topk_fp32": _topk_roofline(_clean_ms(topk_ms, "topk"), 1.0, 4),
        "topk_bf16_index": _topk_roofline(_clean_ms(topk_ms_bf16, "topk"), 1.0, 2),
        "topk_int8_index": _topk_roofline(_clean_ms(topk_ms_int8, "topk"), 1.0, 1),
        "sparse_adagrad_4Mx128": _hbm_roofline(
            sparse_row_bytes, _clean_ms(sparse_4m, "sparse_opt")
        ),
        "session_transformer": _roofline(
            _clean_ms(sess_ms, "session"), flops=sess_flops
        ),
    }
    clean_window = {
        name: (c is not None and 0.0 < c <= 1.5)
        for name, c in contention.items()
    }
    clean_estimate_ms = {
        k: _r(v)
        for k, v in {
            "two_tower_headline": _clean_ms(best_step_s * 1e3, headline_section),
            "dlrm": _clean_ms(dlrm_ms, "dlrm"),
            "session": _clean_ms(sess_ms, "session"),
            "session_bucket": _clean_ms(sb_ms, "session_bucket"),
            "topk_fp32": _clean_ms(topk_ms, "topk"),
            "topk_bf16_index": _clean_ms(topk_ms_bf16, "topk"),
            "topk_int8_index": _clean_ms(topk_ms_int8, "topk"),
            "sparse_adagrad_4Mx128": _clean_ms(sparse_4m, "sparse_opt"),
            "bf16_sr_16Mx128": _clean_ms(bf16_16m, "sparse_opt"),
        }.items()
        if v is not None
    }
    flops_per_step = {
        "two_tower_headline": _r(best_flops, 0),
        "dlrm": _r(dlrm_flops, 0),
        "session_transformer": _r(sess_flops, 0),
    }
    result = {
        "metric": "two_tower_train_examples_per_sec",
        "value": _r(best_eps, 1),
        "unit": "examples/sec",
        "vs_baseline": _r(best_eps / REFERENCE_EXAMPLES_PER_SEC, 3),
        "extra": {
            "headline_policy": best_policy,
            "compute_examples_per_sec_fp32": _r(examples_per_sec, 1),
            "compute_step_ms": _r(step_ms),
            "compute_examples_per_sec_bf16": _r(eps_bf16, 1),
            "compute_step_ms_bf16": _r(step_ms_bf16),
            "compute_examples_per_sec_bf16_state": _r(eps_bf16s, 1),
            "compute_step_ms_bf16_state": _r(step_ms_bf16s),
            "est_hbm_traffic_mb_per_step": _r(est_traffic / 2**20, 1),
            "est_hbm_bw_util_pct": _r(hbm_pct, 1),
            "dlrm_criteo_examples_per_sec": _r(dlrm_eps, 1),
            "dlrm_criteo_step_ms": _r(dlrm_ms),
            "session_transformer_sessions_per_sec": _r(sess_eps, 1),
            "session_transformer_step_ms": _r(sess_ms),
            # pad="bucket" end-to-end fit() through the per-group
            # device-resident fused path (variable-length sessions)
            "session_bucket_pipeline_sessions_per_sec": _r(sb_eps, 1),
            "session_bucket_pipeline_step_ms": _r(sb_ms),
            "pipeline_examples_per_sec": _r(pipeline_eps, 1),
            "pipeline_vs_compute": _r((pipeline_eps or 0.0) / max(best_eps, 1e-9)),
            "pipeline_breakdown": pipe_breakdown,
            "topk_qps_1M_catalog": _r(topk_qps, 1),
            "topk_ms_per_256q": _r(topk_ms),
            "topk_ms_per_256q_bf16_index": _r(topk_ms_bf16),
            "topk_ms_per_256q_int8_index": _r(topk_ms_int8),
            "topk_qps_1M_catalog_int8_index": _r(
                256.0 / topk_ms_int8 * 1000.0, 1
            ) if topk_ms_int8 else None,
            "topk_qps_1M_catalog_bf16_index": _r(
                256.0 / topk_ms_bf16 * 1000.0, 1
            ) if topk_ms_bf16 else None,
            # pct of the 1-pass catalog-stream bound at the session's
            # calibrated HBM rate (the honest speed-of-light for an exact
            # kernel that must look at every candidate once)
            "topk_roofline_pct": _topk_roofline(topk_ms, 1.0, 4),
            "topk_roofline_pct_bf16_index": _topk_roofline(topk_ms_bf16, 1.0, 2),
            "topk_roofline_pct_int8_index": _topk_roofline(topk_ms_int8, 1.0, 1),
            # per-section achieved/bound ratios at the calibrated stream rate
            # (see the traffic models above _hbm_roofline)
            "roofline_pct": roofline_pct,
            # XLA cost_analysis FLOPs per training step (the MXU-bound half of
            # the roofline denominator; null = cost analysis unavailable)
            "flops_per_step": flops_per_step,
            "index_encode_1M_ms": _r(build_ms, 2),
            "sparse_adagrad_step_ms_4Mx128": _r(sparse_4m),
            "dense_adagrad_step_ms_4Mx128": _r(dense_4m),
            "sparse_vs_dense_speedup": _r(
                dense_4m / max(sparse_4m, 1e-9), 2
            ) if (dense_4m and sparse_4m) else None,
            "sparse_adagrad_step_ms_8Mx128": _r(sparse_8m),
            "dense_adagrad_8Mx128": "OOM (needs 19.1G of 15.75G HBM)",
            "bf16_sr_sparse_adagrad_step_ms_16Mx128": _r(bf16_16m),
            "fp32_16Mx128": "OOM (table+slots 16G of 15.75G HBM)",
            # calibration-kernel slowdown (1.0 = clean) of the window each
            # section's KEPT attempt ran in; contended sections were retried;
            # null = section errored (re-queued once, still failed)
            "contention": contention,
            # True iff the section's KEPT attempt ran at contention <= 1.5
            # (and wasn't the 0.0 poisoned-fast sentinel or an error)
            "clean_window": clean_window,
            # measured/contention ESTIMATES of the clean-window step times for
            # sections whose kept attempt exceeded contention 1.5 — explicit
            # estimates, never the naked number of record (VERDICT r4 #2);
            # clean sections repeat their recorded value here for one-stop
            # reading
            "clean_estimate_ms": clean_estimate_ms,
            "section_errors": _SECTION_ERRORS or None,
            # absolute machine state: best achieved HBM streaming bandwidth
            # of the session's calibration probe (clean v5e window ~600-800)
            "cal_hbm_gbps": _r(cal_gbps, 1),
        },
    }
    print(json.dumps(_json_safe(result), allow_nan=False))
    print(f"# device={jax.devices()[0].device_kind} batch={BATCH}", file=sys.stderr)


def _json_safe(obj):
    """Replace non-finite floats (nan from an all-poisoned _marginal, inf)
    with None so the record is strict JSON; allow_nan=False then guarantees
    nothing non-standard slips through rather than killing the print."""
    import math

    if isinstance(obj, float) and not math.isfinite(obj):
        return None
    if isinstance(obj, dict):
        return {k: _json_safe(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_json_safe(v) for v in obj]
    return obj


def _cli_section_main(argv):
    """``bench.py --section NAME``: run ONE section in this (fresh) process
    and print a single JSON record — the receiving end of
    ``_retry_in_subprocess``. The record is ``{"section", "result",
    "contention", "error"}`` with result/contention null on failure."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--section", required=True)
    p.add_argument("--policy", default="float32")
    p.add_argument("--opt-state", dest="opt_state", default=None)
    a = p.parse_args(argv)

    _require_device()
    # fires inside the parent's 360s subprocess timeout so the parent still
    # gets a parseable section record on a mid-retry tunnel hang
    _arm_wall_watchdog(330.0, record={
        "section": a.section, "result": None, "contention": None,
        "error": "section retry exceeded 330s wall clock (tunnel hang)",
    })
    _configure_compile_cache()
    _CAL_STATE["deadline"] = time.monotonic() + 280

    specs = {s[0]: s for s in _main_specs()}
    policy = None if a.policy == "float32" else a.policy
    specs["pipeline"] = _pipeline_spec(policy, a.opt_state)
    if a.section not in specs:
        print(json.dumps({"section": a.section, "result": None,
                          "contention": None,
                          "error": f"unknown section {a.section!r}"}))
        return
    name, fn, default, kw = specs[a.section]
    kw = dict(kw)
    kw.pop("cli_args", None)
    r, c = _try_section(name, fn, default, **kw)
    print(
        json.dumps(
            _json_safe({"section": name, "result": r, "contention": c,
                        "error": _SECTION_ERRORS.get(name)}),
            allow_nan=False,
        ),
        flush=True,
    )


if __name__ == "__main__":
    if "--section" in sys.argv:
        _cli_section_main(sys.argv[1:])
    else:
        main()
