"""Tensor-train compressed embedding tables (TT-Rec, arxiv 2101.11714).

A (N, D) embedding table is factorized into three TT cores: with
N ≤ n1·n2·n3 and D = d1·d2·d3,

    emb[i] = G1[i1] · G2[i2] · G3[i3]      (matrix product over TT ranks)

where (i1, i2, i3) are the mixed-radix digits of the row id and
G1: (n1, 1, d1, r1), G2: (n2, r1, d2, r2), G3: (n3, r2, d3, 1).

Memory drops from N·D to n1·d1·r1 + n2·r1·d2·r2 + n3·r2·d3 — hundreds of times
smaller for million-row catalogs — while lookups become three small gathers
plus two batched matmuls, an ideal trade on TPU where MXU FLOPs are abundant
and HBM capacity/bandwidth is the scarce resource (the same reasoning the
paper applies to GPU HBM). Gradients flow into the cores densely (they are
tiny), so no sparse-optimizer machinery is needed.

Drop-in for :class:`EmbeddingTable` on the input side (scalar ids or
SequenceFeatures with combiners). Weight-tying heads require a materialized
table and are intentionally unsupported.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..core.aggregation import SEQUENCE_COMBINERS
from ..core.block import Block
from ..core.types import SequenceFeature
from ..schema import ColumnSchema, Schema


def _factorize3(n: int) -> Tuple[int, int, int]:
    """Three near-equal factors with product >= n (row ids padded up)."""
    c = int(math.ceil(n ** (1.0 / 3.0)))
    # search a small window for a tight cover
    best = (c, c, c)
    best_cover = c * c * c
    for a in range(max(1, c - 2), c + 3):
        b = int(math.ceil(math.sqrt(n / a)))
        for bb in (max(1, b - 1), b, b + 1):
            cc = int(math.ceil(n / (a * bb)))
            cover = a * bb * cc
            if cover >= n and cover < best_cover:
                best, best_cover = (a, bb, cc), cover
    return best


def _factorize_dim(d: int) -> Tuple[int, int, int]:
    """Three factors with exact product d (d must factor reasonably; any
    remainder collapses into the last factor)."""
    a = 1
    for cand in range(int(math.isqrt(d)), 0, -1):
        if d % cand == 0:
            a = cand
            break
    rest = d // a
    b = 1
    for cand in range(int(math.isqrt(rest)), 0, -1):
        if rest % cand == 0:
            b = cand
            break
    return a, b, rest // b


class TTEmbeddingTable(Block):
    """Tensor-train factorized embedding lookup (TT-Rec)."""

    def __init__(
        self,
        dim: int,
        col_schema: Union[ColumnSchema, Sequence[ColumnSchema]],
        ranks: Union[int, Tuple[int, int]] = 16,
        sequence_combiner: Optional[str] = None,
        l2_reg: float = 0.0,
        seed: int = 0,
    ):
        cols = [col_schema] if isinstance(col_schema, ColumnSchema) else list(col_schema)
        super().__init__(schema=Schema(cols), block_name=cols[0].domain_name)
        card = cols[0].cardinality
        if card is None:
            raise ValueError(f"Column {cols[0].name} has no cardinality; cannot embed")
        self.dim = int(dim)
        self.input_dim = int(card)
        self.features = [c.name for c in cols]
        self.sequence_combiner = sequence_combiner
        self.l2_reg = l2_reg
        if isinstance(ranks, int):
            ranks = (ranks, ranks)
        r1, r2 = int(ranks[0]), int(ranks[1])
        n1, n2, n3 = _factorize3(self.input_dim)
        d1, d2, d3 = _factorize_dim(self.dim)
        self.shape_n = (n1, n2, n3)
        self.shape_d = (d1, d2, d3)
        self.ranks = (r1, r2)

        # init: product of cores should land near N(0, 0.05) like a plain
        # table; spread the scale across the three cores
        scale = 0.05 ** (1.0 / 3.0)
        k1, k2, k3 = jax.random.split(jax.random.key(seed + 77), 3)
        self.core1 = nnx.Param(jax.random.normal(k1, (n1, 1, d1, r1)) * scale)
        self.core2 = nnx.Param(jax.random.normal(k2, (n2, r1, d2, r2)) * scale / math.sqrt(r1))
        self.core3 = nnx.Param(jax.random.normal(k3, (n3, r2, d3, 1)) * scale / math.sqrt(r2))

    # ------------------------------------------------------------------
    @property
    def compression_ratio(self) -> float:
        dense = self.input_dim * self.dim
        tt = sum(int(np.prod(c.value.shape)) for c in (self.core1, self.core2, self.core3))
        return dense / tt

    def _digits(self, ids: jnp.ndarray):
        n1, n2, n3 = self.shape_n
        i3 = ids % n3
        rest = ids // n3
        i2 = rest % n2
        i1 = rest // n2
        return jnp.clip(i1, 0, n1 - 1), i2, i3

    def _lookup(self, ids: jnp.ndarray) -> jnp.ndarray:
        """(...,) int ids → (..., dim) embeddings: 3 gathers + 2 contractions."""
        shape = ids.shape
        flat = ids.reshape(-1)
        i1, i2, i3 = self._digits(flat)
        g1 = jnp.take(self.core1.value, i1, axis=0)  # (B, 1, d1, r1)
        g2 = jnp.take(self.core2.value, i2, axis=0)  # (B, r1, d2, r2)
        g3 = jnp.take(self.core3.value, i3, axis=0)  # (B, r2, d3, 1)
        # contract TT ranks; keep d-axes: (B, d1, d2, r2)
        left = jnp.einsum("bxar,brcs->bacs", g1, g2)
        emb = jnp.einsum("bacs,bsdy->bacd", left, g3)  # (B, d1, d2, d3)
        return emb.reshape(shape + (self.dim,))

    @property
    def embeddings(self) -> jnp.ndarray:
        """Materialize the full (N, D) table (debug/eval only — defeats the
        compression; kept for parity with EmbeddingTable introspection)."""
        return self._lookup(jnp.arange(self.input_dim))

    def to_array(self) -> np.ndarray:
        return np.asarray(self.embeddings)

    def _call_single(self, value, context=None):
        if isinstance(value, SequenceFeature):
            emb = self._lookup(value.values)
            if self.sequence_combiner is None:
                return SequenceFeature(emb, value.mask)
            return SEQUENCE_COMBINERS[self.sequence_combiner](SequenceFeature(emb, value.mask))
        return self._lookup(value)

    def __call__(self, inputs, *, context=None, **kwargs):
        if isinstance(inputs, dict):
            return {
                name: self._call_single(inputs[name], context=context)
                for name in self.features
                if name in inputs
            }
        return self._call_single(inputs, context=context)

    def regularization_loss(self) -> jnp.ndarray:
        if not self.l2_reg:
            return jnp.zeros(())
        return self.l2_reg * sum(
            jnp.sum(jnp.square(c.value)) for c in (self.core1, self.core2, self.core3)
        )

    def __repr__(self):
        return (
            f"TTEmbeddingTable({self.input_dim}x{self.dim}, n={self.shape_n}, "
            f"d={self.shape_d}, ranks={self.ranks}, {self.compression_ratio:.0f}x compressed)"
        )
