"""Feature-interaction blocks (reference ``merlin/models/tf/blocks/interaction.py``).

All interactions are batched matmuls / elementwise algebra over a stacked feature
tensor (B, F, D) — XLA maps the pairwise-dot batch matmul straight onto the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.block import Block
from ..core.types import TensorDict


class DotProductInteraction(Block):
    """Pairwise dot products between stacked feature embeddings
    (reference ``interaction.py:29``): (B, F, D) → (B, F*(F-1)/2) upper triangle
    (``self_interaction=True`` keeps the diagonal too, → F*(F+1)/2).
    """

    def __init__(self, self_interaction: bool = False):
        super().__init__()
        self.self_interaction = self_interaction

    def __call__(self, inputs: jnp.ndarray, **kwargs):
        if inputs.ndim != 3:
            raise ValueError(
                f"DotProductInteraction expects stacked (B, F, D) input, got {inputs.shape}"
            )
        gram = jnp.einsum("bfd,bgd->bfg", inputs, inputs)  # batched MXU matmul
        f = inputs.shape[1]
        k = 0 if self.self_interaction else 1
        # Extract the upper triangle with a 0/1 one-hot selection MATMUL, not
        # fancy indexing: `gram[:, iu0, iu1]` lowers to an XLA gather whose VJP
        # is a scatter-add over the full (B, F, F) gram — a serialized extra
        # pass that showed up as one of the costliest kernels in the DLRM
        # train step (24MB f32 scatter per step at F=27, B=8192). F is static
        # at trace time, so the index vector comes from numpy (a tiny (T,)
        # constant — jnp.triu_indices would lower to an in-loop scatter); the
        # one-hot itself is generated in-trace and fuses into the MXU matmul.
        # The selection einsum runs at HIGHEST precision: with 0/1 weights and
        # finite gram entries it then selects exactly (TPU DEFAULT would
        # bf16-round the fp32 gram operand — ADVICE r4); it is tiny, (B, F*F)
        # x (T, F*F). Caveat: a non-finite NON-selected gram entry (inf/NaN)
        # still poisons its output row via 0*inf=NaN — upstream inputs must be
        # finite, as the reference's gather-based extraction also assumed.
        import jax

        iu = np.triu_indices(f, k=k)
        flat_idx = jnp.asarray((iu[0] * f + iu[1]).astype(np.int32))  # (T,)
        onehot = (
            flat_idx[:, None] == jnp.arange(f * f, dtype=jnp.int32)[None, :]
        ).astype(gram.dtype)  # (T, F*F)
        return jnp.einsum(
            "bq,tq->bt", gram.reshape(gram.shape[0], f * f), onehot,
            precision=jax.lax.Precision.HIGHEST,
        )


class FMPairwiseInteraction(Block):
    """Factorization-machine 2nd-order term 0.5*((Σv)² − Σv²)
    (reference ``interaction.py:205``): (B, F, D) → (B, D)."""

    def __call__(self, inputs: jnp.ndarray, **kwargs):
        if inputs.ndim != 3:
            raise ValueError(f"FMPairwiseInteraction expects (B, F, D), got {inputs.shape}")
        sum_sq = jnp.square(jnp.sum(inputs, axis=1))
        sq_sum = jnp.sum(jnp.square(inputs), axis=1)
        return 0.5 * (sum_sq - sq_sum)


class XDeepFmOuterProduct(Block):
    """One CIN layer (xDeepFM): feature-map outer products compressed by a learned
    kernel (reference ``interaction.py:133``). x^k_{h} = Σ_{i,j} W^k_{h,i,j}
    (x^{k-1}_i ∘ x^0_j)."""

    def __init__(self, dim: int, seed: int = 0):
        super().__init__()
        self.dim = dim
        self.seed = seed
        from flax import nnx

        self.kernel = nnx.data(None)

    def __call__(self, inputs, **kwargs):
        """inputs: list/tuple (x_prev (B,Hk,D), x0 (B,F,D)) or single tensor for both."""
        import jax
        from flax import nnx

        if isinstance(inputs, (list, tuple)):
            x_prev, x0 = inputs
        else:
            x_prev = x0 = inputs
        h_prev, f0 = x_prev.shape[1], x0.shape[1]
        if self.kernel is None:
            if isinstance(x_prev, jax.core.Tracer):
                raise RuntimeError("XDeepFmOuterProduct not built; run an eager build pass")
            init = nnx.initializers.glorot_uniform()
            self.kernel = nnx.Param(
                init(jax.random.key(self.seed), (self.dim, h_prev, f0), jnp.float32)
            )
        # outer products per embedding dim, compressed over (h, f)
        outer = jnp.einsum("bhd,bfd->bhfd", x_prev, x0)
        return jnp.einsum("bhfd,khf->bkd", outer, self.kernel.value)


class FMBlock(Block):
    """Full factorization machine: global bias + 1st-order weights + 2nd-order
    pairwise term (reference ``interaction.py:256``). Consumes the *schema* to build
    dim-1 "wide" embeddings plus shared latent embeddings."""

    def __init__(self, schema, latent_dim: Optional[int] = None, seed: int = 0):
        from flax import nnx

        from ..core.aggregation import StackFeatures
        from ..inputs.embedding import Embeddings
        from ..schema import Tags, infer_embedding_dim

        super().__init__(schema=schema.categorical)
        cat = schema.categorical
        dim = latent_dim or max(infer_embedding_dim(c) for c in cat)
        self.latent = Embeddings(cat, dim=dim, sequence_combiner="mean", seed=seed)
        self.wide = Embeddings(cat, dim=1, sequence_combiner="sum", seed=seed + 7)
        self.bias = nnx.Param(jnp.zeros((1,)))
        self.stack = StackFeatures(axis=1)
        self.pairwise = FMPairwiseInteraction()

    def __call__(self, inputs: TensorDict, **kwargs):
        latent = self.stack(self.latent(inputs))  # (B, F, D)
        second = jnp.sum(self.pairwise(latent), axis=-1, keepdims=True)  # (B, 1)
        wide_terms = self.wide(inputs)  # dict name -> (B, 1)
        first = sum(jnp.sum(v.reshape(v.shape[0], -1), axis=-1, keepdims=True) for v in wide_terms.values())
        return self.bias.value[None, :] + first + second
