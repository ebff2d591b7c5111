"""Loss functions (reference ``merlin/models/tf/losses/``).

All losses are pure ``(labels, logits, sample_weight) -> scalar`` functions usable
directly inside the jitted train step. Registry names match the reference so string
configs carry over ("bpr", "top1_max", "categorical_crossentropy", ...).

Conventions:
- classification losses take **logits** (numerically-stable log-sum-exp forms);
- pairwise ranking losses (reference ``losses/pairwise.py``) follow the contrastive
  head's layout: column 0 is the positive, columns 1..N are negatives.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

from .registry import loss_registry


def _weighted_mean(values: jnp.ndarray, sample_weight: Optional[jnp.ndarray]) -> jnp.ndarray:
    if sample_weight is None:
        return jnp.mean(values)
    # (B, 1+N) per-candidate weights from ContrastiveSampleWeight, adapted to
    # the loss's element shape: rowwise losses (softmax CE) take the positive
    # column; (B, N) pairwise losses take w_pos * w_neg per pair. Elementwise
    # (B, 1+N) losses (binary CE) broadcast unchanged below.
    if sample_weight.ndim == 2 and sample_weight.shape[1] > 1:
        if values.ndim == 1 and values.shape[0] == sample_weight.shape[0]:
            sample_weight = sample_weight[:, 0]
        elif (
            values.ndim == 2
            and values.shape[0] == sample_weight.shape[0]
            and sample_weight.shape[1] == values.shape[1] + 1
        ):
            sample_weight = sample_weight[:, :1] * sample_weight[:, 1:]
    w = jnp.broadcast_to(sample_weight.reshape(sample_weight.shape + (1,) * (values.ndim - sample_weight.ndim)), values.shape)
    w = w.astype(values.dtype)
    return jnp.sum(values * w) / jnp.maximum(jnp.sum(w), 1e-9)


# ---------------------------------------------------------------------------
# listwise / pointwise
# ---------------------------------------------------------------------------

@loss_registry.register_with_multiple_names("binary_crossentropy", "bce")
def binary_crossentropy(labels, logits, sample_weight=None):
    labels = labels.reshape(logits.shape).astype(logits.dtype)
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return _weighted_mean(per, sample_weight)


@loss_registry.register_with_multiple_names("categorical_crossentropy", "cce")
def categorical_crossentropy(labels, logits, sample_weight=None):
    """Dense (possibly soft / one-hot) targets over the logits' last axis."""
    labels = labels.astype(logits.dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.sum(labels * logp, axis=-1)
    return _weighted_mean(per, sample_weight)


@loss_registry.register_with_multiple_names(
    "sparse_categorical_crossentropy", "sparse_cce"
)
def sparse_categorical_crossentropy(labels, logits, sample_weight=None):
    labels = labels.reshape(labels.shape[:1] + logits.shape[1:-1]).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return _weighted_mean(per, sample_weight)


@loss_registry.register_with_multiple_names("mse", "mean_squared_error")
def mean_squared_error(labels, logits, sample_weight=None):
    labels = labels.reshape(logits.shape).astype(logits.dtype)
    return _weighted_mean(jnp.square(labels - logits), sample_weight)


@loss_registry.register_with_multiple_names("mae", "mean_absolute_error")
def mean_absolute_error(labels, logits, sample_weight=None):
    labels = labels.reshape(logits.shape).astype(logits.dtype)
    return _weighted_mean(jnp.abs(labels - logits), sample_weight)


# ---------------------------------------------------------------------------
# pairwise ranking (reference losses/pairwise.py: positive col 0 vs negatives)
# ---------------------------------------------------------------------------

def _pos_neg_distance(labels, logits):
    """positive-minus-negative score matrix (B, N).

    ``labels`` may be one-hot [1,0,...,0] (contrastive layout) — we use column 0 as
    the positive; this matches the head's Prediction layout.
    """
    pos = logits[:, :1]
    negs = logits[:, 1:]
    return pos - negs, negs


@loss_registry.register("bpr")
def bpr_loss(labels, logits, sample_weight=None):
    dist, _ = _pos_neg_distance(labels, logits)
    per = -jax.nn.log_sigmoid(dist)
    return _weighted_mean(per, sample_weight)


@loss_registry.register_with_multiple_names("bpr-max", "bpr_max")
def bpr_max_loss(labels, logits, sample_weight=None, reg: float = 1.0):
    """Reference-exact BPR-max (``tf/losses/pairwise.py:242``): per-ELEMENT
    ``-log(sigmoid(sub_j) * w_j) + reg * w_j * negs_j^2`` averaged over (B, N).
    Note the reference deviates from Hidasi et al. 2018 eq. 12 (which takes the
    log of the softmax-weighted SUM); we match the reference so tuned configs
    transfer. The paper form is available as :func:`bpr_max_paper_loss`."""
    dist, negs = _pos_neg_distance(labels, logits)
    w = jax.nn.softmax(negs, axis=-1)
    per = -jnp.log(jax.nn.sigmoid(dist) * w + 1e-24) + reg * w * jnp.square(negs)
    return _weighted_mean(per, sample_weight)


@loss_registry.register_with_multiple_names("bpr-max-paper", "bpr_max_paper")
def bpr_max_paper_loss(labels, logits, sample_weight=None, reg: float = 1.0):
    """BPR-max as published (Hidasi et al. 2018 eq. 12): row-wise
    ``-log(sum_j w_j * sigmoid(dist_j)) + reg * sum_j w_j * negs_j^2``."""
    dist, negs = _pos_neg_distance(labels, logits)
    w = jax.nn.softmax(negs, axis=-1)
    per = -jnp.log(jnp.sum(w * jax.nn.sigmoid(dist), axis=-1) + 1e-12)
    if reg:
        per = per + reg * jnp.sum(w * jnp.square(negs), axis=-1)
    return _weighted_mean(per, sample_weight)


@loss_registry.register("top1")
def top1_loss(labels, logits, sample_weight=None):
    dist, negs = _pos_neg_distance(labels, logits)
    per = jnp.mean(jax.nn.sigmoid(-dist) + jax.nn.sigmoid(jnp.square(negs)), axis=-1)
    return _weighted_mean(per, sample_weight)


@loss_registry.register_with_multiple_names("top1_v2", "top1-v2")
def top1_v2_loss(labels, logits, sample_weight=None):
    """TOP1 with the positive's own square subtracted (reference ``TOP1v2Loss``)."""
    pos = logits[:, :1]
    negs = logits[:, 1:]
    n = negs.shape[-1]
    per = jnp.mean(jax.nn.sigmoid(negs - pos) + jax.nn.sigmoid(jnp.square(negs)), axis=-1)
    per = per - jax.nn.sigmoid(jnp.square(pos[:, 0])) / max(n, 1)
    return _weighted_mean(per, sample_weight)


@loss_registry.register_with_multiple_names("top1_max", "top1-max")
def top1_max_loss(labels, logits, sample_weight=None):
    """Reference-exact TOP1-max (``tf/losses/pairwise.py:329``): the
    softmax-weighted per-element matrix is mean-reduced over ALL (B, N)
    elements (Keras' default reduction) — i.e. 1/N times the paper's row-wise
    weighted sum. The scale only rescales the LR, but parity means tuned
    reference configs transfer unchanged."""
    dist, negs = _pos_neg_distance(labels, logits)
    w = jax.nn.softmax(negs, axis=-1)
    per = w * (jax.nn.sigmoid(-dist) + jax.nn.sigmoid(jnp.square(negs)))
    return _weighted_mean(per, sample_weight)


@loss_registry.register("logistic")
def logistic_loss(labels, logits, sample_weight=None):
    dist, _ = _pos_neg_distance(labels, logits)
    per = jnp.log1p(jnp.exp(-dist))
    return _weighted_mean(per, sample_weight)


@loss_registry.register("hinge")
def hinge_loss(labels, logits, sample_weight=None):
    dist, _ = _pos_neg_distance(labels, logits)
    per = jnp.maximum(0.0, 1.0 - dist)
    return _weighted_mean(per, sample_weight)


def get_loss(loss: Union[str, Callable]) -> Callable:
    if callable(loss):
        return loss
    return loss_registry[loss]
