"""Compute-dtype policy (the Keras ``mixed_precision.set_global_policy``
equivalent, reference usage: transformer notebooks set ``mixed_float16``).

``mixed_bfloat16`` casts matmul *inputs* to bfloat16 on the hot paths (tower
MLPs, contrastive logits, fused sampled-softmax tiles, attention) while keeping
master weights and accumulation in float32 (``preferred_element_type``): on TPU
v5e the MXU's bf16 peak is ~5x its fp32 peak and HBM traffic halves, with fp32
accumulators preserving loss quality.
"""

from __future__ import annotations

import jax.numpy as jnp

_POLICIES = ("float32", "mixed_bfloat16")
_policy = "float32"


def set_dtype_policy(name: str) -> None:
    global _policy
    if name not in _POLICIES:
        raise ValueError(f"Unknown dtype policy {name!r}; options: {_POLICIES}")
    _policy = name


def get_dtype_policy() -> str:
    return _policy


def compute_dtype():
    return jnp.bfloat16 if _policy == "mixed_bfloat16" else jnp.float32


def cast_compute(x):
    """Cast a floating array to the policy compute dtype (ints/bools pass)."""
    cd = compute_dtype()
    if cd == jnp.float32:
        return x
    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
        return x.astype(cd)
    return x
