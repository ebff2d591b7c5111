"""Flash-style sampled-softmax CE as real Pallas kernels.

The XLA-scan fused loss (ops/contrastive.py) avoids the (Q, N) logit matrix but
still materializes each (Q, tile) logit block in HBM — at the headline config
(Q = N = 8192) that is ~1GB of logit traffic per step and the actual step-time
bottleneck. These kernels keep every logit tile in VMEM:

- :func:`lse_forward` — online log-sum-exp over negative tiles; the running
  (max, sum) state lives in the output block (constant index_map → VMEM-resident
  across the negative-tile grid axis).
- :func:`grad_query` / :func:`grad_neg` — backward recomputation
  (flash-attention style): each recomputes its logit tiles and accumulates
  ``coef @ neg`` / ``coefᵀ @ q`` in a VMEM output block.

Padding contract: padded negative columns carry ``bias = MIN_FLOAT`` so they
vanish in both softmax and gradients — no separate validity mask in-kernel.
SURVEY.md §7 kernel #2, now actually a kernel.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.constants import MIN_FLOAT

# chip-swept r5 (Q=N=8192, D=128, full value+grad): (1024, 2048) = 0.357 ms
# vs (512, 1024) = 0.444, (512, 2048) = 0.401, (512, 4096) = 0.625;
# (2048, 2048) exceeds the 16 MB scoped-VMEM limit (18.4 MB logit tiles).
# Q pads to TQ, so sub-1024 batches pay padding — still sub-ms at those sizes.
TQ = 1024
TN = 2048


def _pad_rows(a, tile, value=0.0):
    pad = (-a.shape[0]) % tile
    if pad == 0:
        return a
    if a.ndim == 1:
        return jnp.pad(a, (0, pad), constant_values=value)
    return jnp.pad(a, ((0, pad), (0, 0)), constant_values=value)


def _prep(query, pos_logit_like, neg_emb, pos_id, neg_id, bias, tq, tn):
    """Pad operands; fold column validity into the bias. ``pos_logit_like`` is
    a list of ((Q, 1) array, row-pad value) — e.g. lse pads with +huge so
    padded query rows get softmax ~ 0 instead of inf*0 NaNs."""
    Q, D = query.shape
    N = neg_emb.shape[0]
    qp = _pad_rows(query, tq)
    negp = _pad_rows(neg_emb, tn)
    Np = negp.shape[0]
    b = jnp.zeros((N,), jnp.float32) if bias is None else bias.astype(jnp.float32)
    b = jnp.pad(b, (0, Np - N), constant_values=MIN_FLOAT)
    pid = jnp.full((Q,), -2, jnp.int32) if pos_id is None else pos_id.astype(jnp.int32)
    pid = _pad_rows(pid, tq, value=-2)
    nid = jnp.full((N,), -1, jnp.int32) if neg_id is None else neg_id.astype(jnp.int32)
    nid = jnp.pad(nid.astype(jnp.int32), (0, Np - N), constant_values=-1)
    extras = [_pad_rows(x, tq, value=v) for x, v in pos_logit_like]
    # 1-D operands trip Mosaic/XLA layout mismatches; ship them as (1, n) rows
    return qp, negp, pid[None, :], nid[None, :], b[None, :], extras, Q, N


def _logits_tile(q, neg, pid_row, nid_row, bias_row, temperature, downscore):
    """pid_row (1, tq), nid_row/bias_row (1, tn) — 2-D row-vector operands."""
    s = jnp.dot(q, neg.T, preferred_element_type=jnp.float32)
    s = s + bias_row
    if downscore:
        s = jnp.where(nid_row == pid_row.T, MIN_FLOAT, s)
    return s / temperature


def lse_forward(
    query, pos_logit, neg_emb, pos_id, neg_id, bias,
    temperature: float, downscore: bool, tq: int = TQ, tn: int = TN,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Online (running max, rescaled sum) over all negative tiles; the positive
    logit seeds the accumulator. Returns (m, s) of shape (Q,)."""
    from jax.experimental import pallas as pl

    qp, negp, pid, nid, b, (pl_pad,), Q, N = _prep(
        query, [(pos_logit.reshape(-1, 1), 0.0)], neg_emb, pos_id, neg_id, bias, tq, tn
    )
    grid = (qp.shape[0] // tq, negp.shape[0] // tn)

    def kernel(q_ref, pl_ref, pid_ref, neg_ref, nid_ref, b_ref, m_ref, s_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            m_ref[:] = pl_ref[:]
            s_ref[:] = jnp.ones_like(s_ref)

        logits = _logits_tile(
            q_ref[:], neg_ref[:], pid_ref[:], nid_ref[:], b_ref[:], temperature, downscore
        )
        m = m_ref[:, 0]
        tile_max = jnp.max(logits, axis=1)
        new_m = jnp.maximum(m, tile_max)
        s_ref[:, 0] = s_ref[:, 0] * jnp.exp(m - new_m) + jnp.sum(
            jnp.exp(logits - new_m[:, None]), axis=1
        )
        m_ref[:, 0] = new_m

    D = qp.shape[1]
    m, s = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, D), lambda i, j: (i, 0)),
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, tq), lambda i, j: (0, i)),
            pl.BlockSpec((tn, D), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((qp.shape[0], 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, pl_pad, pid, negp, nid, b)
    return m[:Q, 0], s[:Q, 0]


def grad_query(
    query, neg_emb, lse, gw, pos_id, neg_id, bias,
    temperature: float, downscore: bool, tq: int = TQ, tn: int = TN,
    interpret: bool = False,
) -> jnp.ndarray:
    """Σ_j coef_ij · neg_j where coef = gw * softmax / T (negatives part of dq)."""
    from jax.experimental import pallas as pl

    qp, negp, pid, nid, b, (lse_p, gw_p), Q, N = _prep(
        query, [(lse.reshape(-1, 1), 1e30), (gw.reshape(-1, 1), 0.0)],
        neg_emb, pos_id, neg_id, bias, tq, tn,
    )
    grid = (qp.shape[0] // tq, negp.shape[0] // tn)
    D = qp.shape[1]

    def kernel(q_ref, lse_ref, gw_ref, pid_ref, neg_ref, nid_ref, b_ref, dq_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            dq_ref[:] = jnp.zeros_like(dq_ref)

        logits = _logits_tile(
            q_ref[:], neg_ref[:], pid_ref[:], nid_ref[:], b_ref[:], temperature, downscore
        )
        p = jnp.exp(logits - lse_ref[:])  # (tq, tn); padded rows produce garbage, sliced off
        coef = gw_ref[:] * p / temperature
        dq_ref[:] += jnp.dot(
            coef, neg_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32
        )

    dq = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, D), lambda i, j: (i, 0)),
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, tq), lambda i, j: (0, i)),
            pl.BlockSpec((tn, D), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((tq, D), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((qp.shape[0], D), jnp.float32),
        interpret=interpret,
    )(qp, lse_p, gw_p, pid, negp, nid, b)
    return dq[:Q]


def grad_neg(
    query, neg_emb, lse, gw, pos_id, neg_id, bias,
    temperature: float, downscore: bool, tq: int = TQ, tn: int = TN,
    interpret: bool = False,
) -> jnp.ndarray:
    """Σ_i coef_ij · q_i (dneg); grid iterates query tiles innermost so the
    (tn, D) accumulator stays VMEM-resident per negative tile."""
    from jax.experimental import pallas as pl

    qp, negp, pid, nid, b, (lse_p, gw_p), Q, N = _prep(
        query, [(lse.reshape(-1, 1), 1e30), (gw.reshape(-1, 1), 0.0)],
        neg_emb, pos_id, neg_id, bias, tq, tn,
    )
    grid = (negp.shape[0] // tn, qp.shape[0] // tq)  # n outer, q inner
    D = qp.shape[1]

    def kernel(q_ref, lse_ref, gw_ref, pid_ref, neg_ref, nid_ref, b_ref, dn_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            dn_ref[:] = jnp.zeros_like(dn_ref)

        logits = _logits_tile(
            q_ref[:], neg_ref[:], pid_ref[:], nid_ref[:], b_ref[:], temperature, downscore
        )
        p = jnp.exp(logits - lse_ref[:])
        # padded QUERY rows must not contribute to dneg: gw is zero-padded
        coef = gw_ref[:] * p / temperature
        dn_ref[:] += jnp.dot(
            coef.T, q_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32
        )

    dn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, D), lambda n, i: (i, 0)),
            pl.BlockSpec((tq, 1), lambda n, i: (i, 0)),
            pl.BlockSpec((tq, 1), lambda n, i: (i, 0)),
            pl.BlockSpec((1, tq), lambda n, i: (0, i)),
            pl.BlockSpec((tn, D), lambda n, i: (n, 0)),
            pl.BlockSpec((1, tn), lambda n, i: (0, n)),
            pl.BlockSpec((1, tn), lambda n, i: (0, n)),
        ],
        out_specs=pl.BlockSpec((tn, D), lambda n, i: (n, 0)),
        out_shape=jax.ShapeDtypeStruct((negp.shape[0], D), jnp.float32),
        interpret=interpret,
    )(qp, lse_p, gw_p, pid, negp, nid, b)
    return dn[:N]
