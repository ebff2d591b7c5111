"""Blockwise sampled-softmax contrastive loss (flash-softmax style).

For catalog-scale negative sets (N ~ 10⁵–10⁶, e.g. full-catalog sampled softmax)
materializing the (Q, N) logit matrix in HBM is the bottleneck the reference hits
on GPU. This op streams negative tiles and keeps only O(Q) state:

    loss_i = logsumexp_j(logits_ij) - pos_logit_i

via online log-sum-exp accumulation (running max + rescaled sum), with logQ
correction and false-negative masking applied per tile in registers. The custom
VJP recomputes tile logits in the backward pass (flash-attention-style re-
materialization): memory O(Q·D + tile·D) instead of O(Q·N).

SURVEY.md §7 kernel #2.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.constants import LOGQ_EPS, MIN_FLOAT


def _tile_logits(query, neg_emb_t, neg_id_t, pos_id, bias_t, temperature):
    s = jnp.matmul(query, neg_emb_t.T, preferred_element_type=jnp.float32)
    if bias_t is not None:
        # additive pre-temperature bias; the caller passes -log(p_sampling+eps)
        # for logQ correction
        s = s + bias_t[None, :]
    if pos_id is not None and neg_id_t is not None:
        s = jnp.where(neg_id_t[None, :] == pos_id[:, None], MIN_FLOAT, s)
    return s / temperature


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def sampled_softmax_loss(
    query: jnp.ndarray,       # (Q, D)
    pos_emb: jnp.ndarray,     # (Q, D)
    neg_emb: jnp.ndarray,     # (N, D)
    pos_id: Optional[jnp.ndarray],   # (Q,) or None
    neg_id: Optional[jnp.ndarray],   # (N,) or None
    weights: Optional[jnp.ndarray],  # (Q,) or None
    neg_bias: Optional[jnp.ndarray] = None,  # (N,) additive logit bias (logQ)
    temperature: float = 1.0,
    tile: int = 8192,
    pos_bias: Optional[jnp.ndarray] = None,  # (Q,) positive logit bias (logQ)
) -> jnp.ndarray:
    """Streaming sampled-softmax CE.

    CONTRACT: ``weights``, ``neg_bias`` and ``pos_bias`` are treated as
    CONSTANTS — the custom VJP returns no cotangent for them (they are logQ
    corrections / sample weights, non-trainable throughout this framework and
    the reference). ``stop_gradient`` here makes that explicit rather than
    silently dropping a gradient someone tries to train through."""
    if weights is not None:
        weights = jax.lax.stop_gradient(weights)
    if neg_bias is not None:
        neg_bias = jax.lax.stop_gradient(neg_bias)
    if pos_bias is not None:
        pos_bias = jax.lax.stop_gradient(pos_bias)
    loss, _ = _forward(query, pos_emb, neg_emb, pos_id, neg_id, weights, neg_bias,
                       temperature, tile, pos_bias)
    return loss


def _tile_inputs(neg_emb, neg_id, neg_bias, tile):
    N, D = neg_emb.shape
    pad = (-N) % tile
    if pad:
        neg_emb = jnp.pad(neg_emb, ((0, pad), (0, 0)))
        neg_id = jnp.pad(neg_id, (0, pad), constant_values=-1) if neg_id is not None else None
        neg_bias = jnp.pad(neg_bias, (0, pad)) if neg_bias is not None else None
    n_tiles = neg_emb.shape[0] // tile
    xs = {
        "emb": neg_emb.reshape(n_tiles, tile, D),
        "valid": jnp.arange(n_tiles * tile).reshape(n_tiles, tile) < N,
    }
    if neg_id is not None:
        xs["id"] = neg_id.reshape(n_tiles, tile)
    if neg_bias is not None:
        xs["bias"] = neg_bias.reshape(n_tiles, tile)
    return xs


_FORCE_SCAN = False  # test hook: disable the Pallas path


def _use_flash(query=None, neg_emb=None) -> bool:
    if _FORCE_SCAN:
        return False
    if query is not None:
        D = query.shape[-1]
        # conservative Mosaic shape envelope; odd dims use the scan path
        if D < 32 or D % 8 != 0 or query.shape[0] < 8 or neg_emb.shape[0] < 8:
            return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _loss_from_lse(pos_logit, m, s, weights):
    per = (m + jnp.log(s)) - pos_logit
    if weights is None:
        return jnp.mean(per)
    w = weights.astype(per.dtype)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-9)


def _forward(query, pos_emb, neg_emb, pos_id, neg_id, weights, neg_bias, temperature,
             tile, pos_bias=None):
    Q, D = query.shape

    if _use_flash(query, neg_emb):
        from . import flash_ce

        pos_logit = jnp.einsum(
            "qd,qd->q", query, pos_emb, preferred_element_type=jnp.float32
        ) / temperature
        if pos_bias is not None:
            # positive logQ correction (reference tf/outputs/contrastive.py:317):
            # the bias lands on raw scores BEFORE temperature scaling, so it is
            # divided by T here — same convention as neg_bias in _tile_logits
            pos_logit = pos_logit + pos_bias / temperature
        m, s = flash_ce.lse_forward(
            query, pos_logit, neg_emb, pos_id, neg_id, neg_bias, temperature,
            downscore=(pos_id is not None and neg_id is not None),
        )
        return _loss_from_lse(pos_logit, m, s, weights), (m, s)

    xs = _tile_inputs(neg_emb, neg_id, neg_bias, tile)

    pos_logit = jnp.einsum(
        "qd,qd->q", query, pos_emb, preferred_element_type=jnp.float32
    ) / temperature  # (Q,)
    if pos_bias is not None:
        pos_logit = pos_logit + pos_bias / temperature

    def body(carry, t):
        m, s = carry  # running max (Q,), running sum of exp (Q,)
        logits = _tile_logits(query, t["emb"], t.get("id"), pos_id, t.get("bias"), temperature)
        logits = jnp.where(t["valid"][None, :], logits, MIN_FLOAT)
        tile_max = jnp.max(logits, axis=1)
        new_m = jnp.maximum(m, tile_max)
        s = s * jnp.exp(m - new_m) + jnp.sum(jnp.exp(logits - new_m[:, None]), axis=1)
        return (new_m, s), None

    init = (pos_logit, jnp.exp(jnp.zeros(Q)))  # positive included from the start
    (m, s), _ = jax.lax.scan(body, init, xs)
    lse = m + jnp.log(s)
    per = lse - pos_logit
    if weights is None:
        loss = jnp.mean(per)
    else:
        w = weights.astype(per.dtype)
        loss = jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-9)
    return loss, (m, s)


def _fwd(query, pos_emb, neg_emb, pos_id, neg_id, weights, neg_bias, temperature, tile,
         pos_bias=None):
    loss, (m, s) = _forward(query, pos_emb, neg_emb, pos_id, neg_id, weights, neg_bias,
                            temperature, tile, pos_bias)
    return loss, (query, pos_emb, neg_emb, pos_id, neg_id, weights, neg_bias, pos_bias, m, s)


def _bwd(temperature, tile, res, g):
    query, pos_emb, neg_emb, pos_id, neg_id, weights, neg_bias, pos_bias, m, s = res
    Q, D = query.shape
    N = neg_emb.shape[0]
    lse = m + jnp.log(s)
    if weights is None:
        w = jnp.full((Q,), 1.0 / Q)
    else:
        w = weights / jnp.maximum(jnp.sum(weights), 1e-9)
    gw = g * w  # (Q,)

    # d loss_i / d logit_ij = softmax_ij ; d loss_i / d pos_logit_i = softmax_pos - 1
    pos_logit = jnp.einsum(
        "qd,qd->q", query, pos_emb, preferred_element_type=jnp.float32
    ) / temperature
    if pos_bias is not None:
        pos_logit = pos_logit + pos_bias / temperature
    p_pos = jnp.exp(pos_logit - lse)
    coef_pos = gw * (p_pos - 1.0) / temperature  # (Q,)
    d_query = coef_pos[:, None] * pos_emb.astype(jnp.float32)
    d_pos = (coef_pos[:, None] * query.astype(jnp.float32)).astype(pos_emb.dtype)

    if _use_flash(query, neg_emb):
        from . import flash_ce

        downscore = pos_id is not None and neg_id is not None
        d_query = d_query + flash_ce.grad_query(
            query, neg_emb, lse, gw, pos_id, neg_id, neg_bias, temperature, downscore
        )
        d_neg = flash_ce.grad_neg(
            query, neg_emb, lse, gw, pos_id, neg_id, neg_bias, temperature, downscore
        )
        return (
            d_query.astype(query.dtype),
            d_pos,
            d_neg.astype(neg_emb.dtype),
            None, None, None, None, None,
        )

    xs = _tile_inputs(neg_emb, neg_id, neg_bias, tile)

    def body(d_query, t):
        logits = _tile_logits(query, t["emb"], t.get("id"), pos_id, t.get("bias"), temperature)
        logits = jnp.where(t["valid"][None, :], logits, MIN_FLOAT)
        p = jnp.exp(logits - lse[:, None])  # (Q, T) softmax over full set
        coef = gw[:, None] * p / temperature
        d_query = d_query + jnp.matmul(coef, t["emb"], preferred_element_type=jnp.float32)
        d_neg_t = jnp.matmul(coef.T, query, preferred_element_type=jnp.float32)
        return d_query, d_neg_t

    d_query, d_neg_tiles = jax.lax.scan(body, d_query, xs)
    d_neg = d_neg_tiles.reshape(-1, D)[:N]
    # cotangent dtypes must match the primals (bf16 under mixed policy)
    return (
        d_query.astype(query.dtype),
        d_pos,
        d_neg.astype(neg_emb.dtype),
        None, None, None, None, None,
    )


sampled_softmax_loss.defvjp(_fwd, _bwd)
