"""Session transformer encoder (reference ``merlin/models/tf/transformers/``).

The reference wraps HuggingFace TF main-layers (``transformers/block.py:54-222``
with Bert/Albert/Roberta/XLNet/GPT2 configs). The TPU-native stand-in is a compact
NNX pre-norm transformer encoder compiled whole-graph by XLA:

- padding-aware attention mask from the input :class:`SequenceFeature`;
- causal mode (GPT2-style next-item) or bidirectional (BERT-style MLM);
- learned positional embeddings (session lengths are short and static);
- Albert-style cross-layer parameter sharing as a flag.

Output adapters mirror ``transformers/transforms.py``: ``LastHiddenState``,
``TransformerInferenceHiddenState``, ``SequenceSummary`` (last/mean/cls).
"""

from __future__ import annotations

import copy
from typing import Optional, Union

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.aggregation import sequence_last, sequence_mean
from ..core.block import Block
from ..core.types import SequenceFeature


class TransformerLayer(Block):
    """Pre-norm attention + FFN sublayers with dtype-policy-aware matmuls.

    All six matmuls (q/k/v/out projections, two FFN layers, plus the two
    attention einsums) run their inputs through :func:`cast_compute` with
    ``preferred_element_type=float32`` — under ``mixed_bfloat16`` the MXU
    consumes bf16 operands at ~5x fp32 peak while accumulating fp32; master
    weights, LayerNorm, softmax and residuals stay float32.
    """

    def __init__(self, d_model: int, n_heads: int, d_ff: int, dropout: float, seed: int,
                 relative_attention: bool = False):
        from ..blocks.mlp import Dropout

        super().__init__()
        if d_model % n_heads:
            raise ValueError(f"d_model={d_model} not divisible by n_heads={n_heads}")
        if relative_attention and d_model % 2:
            raise ValueError("relative attention needs an even d_model (sin/cos pairs)")
        rngs = nnx.Rngs(seed)
        self.n_heads = n_heads
        self.d_head = d_model // n_heads
        self.relative = relative_attention
        init = nnx.initializers.glorot_uniform()
        key = jax.random.key(seed + 101)
        kq, kk, kv, ko, k1, k2 = jax.random.split(key, 6)
        if relative_attention:
            # Transformer-XL / XLNet relative attention (reference wraps HF
            # XLNet, tf/transformers/block.py:449): scores decompose into a
            # content term (q+u)·k and a position term (q+v)·r(j-i), with r =
            # sinusoidal relative encodings through a learned projection and
            # u/v global content/position biases
            kr = jax.random.fold_in(key, 7)
            self.wr = nnx.Param(init(kr, (d_model, d_model), jnp.float32))
            self.u = nnx.Param(jnp.zeros((self.n_heads, self.d_head), jnp.float32))
            self.v = nnx.Param(jnp.zeros((self.n_heads, self.d_head), jnp.float32))
        else:
            self.wr = nnx.data(None)
            self.u = nnx.data(None)
            self.v = nnx.data(None)
        self.wq = nnx.Param(init(kq, (d_model, d_model), jnp.float32))
        self.wk = nnx.Param(init(kk, (d_model, d_model), jnp.float32))
        self.wv = nnx.Param(init(kv, (d_model, d_model), jnp.float32))
        self.wo = nnx.Param(init(ko, (d_model, d_model), jnp.float32))
        self.bq = nnx.Param(jnp.zeros((d_model,), jnp.float32))
        self.bk = nnx.Param(jnp.zeros((d_model,), jnp.float32))
        self.bv = nnx.Param(jnp.zeros((d_model,), jnp.float32))
        self.bo = nnx.Param(jnp.zeros((d_model,), jnp.float32))
        self.w1 = nnx.Param(init(k1, (d_model, d_ff), jnp.float32))
        self.b1 = nnx.Param(jnp.zeros((d_ff,), jnp.float32))
        self.w2 = nnx.Param(init(k2, (d_ff, d_model), jnp.float32))
        self.b2 = nnx.Param(jnp.zeros((d_model,), jnp.float32))
        self.ln1 = nnx.LayerNorm(d_model, rngs=rngs)
        self.ln2 = nnx.LayerNorm(d_model, rngs=rngs)
        # attention-internal dropout disabled: dropout is applied statelessly on
        # the sublayer outputs (NNX's stateful rng counter cannot mutate inside
        # the grad trace of the compiled train step)
        self.drop1 = Dropout(dropout, seed=seed + 21)
        self.drop2 = Dropout(dropout, seed=seed + 22)

    def _proj(self, x, w, b):
        from ..core.policy import cast_compute

        B, L, _ = x.shape
        y = jnp.matmul(
            cast_compute(x), cast_compute(w.value), preferred_element_type=jnp.float32
        ) + b.value
        return y.reshape(B, L, self.n_heads, self.d_head)

    def _rel_encoding(self, L: int) -> jnp.ndarray:
        """Sinusoidal encodings of relative offsets j-i in [-(L-1), L-1],
        ascending — (2L-1, d_model)."""
        d_model = self.wq.value.shape[0]
        pos = jnp.arange(-(L - 1), L, dtype=jnp.float32)
        inv = 1.0 / (10000.0 ** (jnp.arange(0, d_model, 2, dtype=jnp.float32) / d_model))
        ang = pos[:, None] * inv[None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)

    def _attn_logits(self, h, attn_mask):
        from ..core.policy import cast_compute

        q = self._proj(h, self.wq, self.bq)
        k = self._proj(h, self.wk, self.bk)
        scale = 1.0 / jnp.sqrt(jnp.float32(self.d_head))
        if self.relative:
            B, L = q.shape[0], q.shape[1]
            r = jnp.matmul(
                cast_compute(self._rel_encoding(L)), cast_compute(self.wr.value),
                preferred_element_type=jnp.float32,
            ).reshape(2 * L - 1, self.n_heads, self.d_head)
            ac = jnp.einsum(
                "blhd,bmhd->bhlm",
                cast_compute(q + self.u.value[None, None]),
                cast_compute(k),
                preferred_element_type=jnp.float32,
            )
            bd_rel = jnp.einsum(
                "blhd,rhd->bhlr",
                cast_compute(q + self.v.value[None, None]),
                cast_compute(r),
                preferred_element_type=jnp.float32,
            )  # (B, H, L, 2L-1) over relative offsets
            # align offset axis: logits[..., i, j] reads offset (j - i) + L-1
            idx = (jnp.arange(L)[None, :] - jnp.arange(L)[:, None]) + L - 1
            bd = jnp.take_along_axis(
                bd_rel,
                jnp.broadcast_to(idx[None, None], (B, self.n_heads, L, L)),
                axis=-1,
            )
            logits = (ac + bd) * scale
        else:
            logits = (
                jnp.einsum(
                    "blhd,bmhd->bhlm",
                    cast_compute(q),
                    cast_compute(k),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
        if attn_mask is not None:
            logits = jnp.where(attn_mask, logits, jnp.finfo(logits.dtype).min)
        return logits

    def _attention(self, h, attn_mask):
        from ..core.policy import cast_compute

        B, L, _ = h.shape
        p = jax.nn.softmax(self._attn_logits(h, attn_mask), axis=-1)
        v = self._proj(h, self.wv, self.bv)
        ctx = jnp.einsum(
            "bhlm,bmhd->blhd",
            cast_compute(p),
            cast_compute(v),
            preferred_element_type=jnp.float32,
        ).reshape(B, L, -1)
        return jnp.matmul(
            cast_compute(ctx), cast_compute(self.wo.value),
            preferred_element_type=jnp.float32,
        ) + self.bo.value

    def __call__(self, x, attn_mask, *, training: bool = False, context=None):
        from ..core.policy import cast_compute

        h = self.ln1(x)
        h = self._attention(h, attn_mask)
        h = self.drop1(h, training=training, context=context)
        x = x + h
        h = self.ln2(x)
        h1 = jax.nn.gelu(
            jnp.matmul(
                cast_compute(h), cast_compute(self.w1.value),
                preferred_element_type=jnp.float32,
            )
            + self.b1.value
        )
        h = jnp.matmul(
            cast_compute(h1), cast_compute(self.w2.value),
            preferred_element_type=jnp.float32,
        ) + self.b2.value
        h = self.drop2(h, training=training, context=context)
        return x + h

    def attention_weights(self, x, attn_mask):
        """Explicit (B, H, L, L) softmax attention weights for introspection
        (recomputed from the layer's own q/k projections — only runs when
        ``output_attentions`` is requested)."""
        return jax.nn.softmax(self._attn_logits(self.ln1(x), attn_mask), axis=-1)


class TransformerBlock(Block):
    """Pre-norm transformer over (B, L, D) session representations."""

    def __init__(
        self,
        d_model: int = 64,
        n_heads: int = 4,
        n_layers: int = 2,
        d_ff: Optional[int] = None,
        causal: bool = False,
        dropout: float = 0.1,
        max_seq_len: int = 512,
        share_layers: bool = False,
        relative_attention: bool = False,
        seed: int = 0,
        block_name: str = "transformer",
        output_hidden_states: bool = False,
        output_attentions: bool = False,
    ):
        super().__init__(block_name=block_name)
        # introspection taps (reference transforms.py:126 HiddenStates /
        # :143 AttentionWeights): collected into context when requested
        self.output_hidden_states = output_hidden_states
        self.output_attentions = output_attentions
        d_ff = d_ff or 4 * d_model
        self.d_model = d_model
        self.causal = causal
        self.share_layers = share_layers
        self.relative_attention = relative_attention
        rngs = nnx.Rngs(seed + 7)
        self.in_proj = nnx.data(None)  # lazy: projects input dim -> d_model
        if relative_attention:
            # Transformer-XL style: position information enters ONLY through
            # the per-layer relative encodings — no absolute position table
            self.pos_emb = nnx.data(None)
        else:
            self.pos_emb = nnx.Param(
                jax.random.truncated_normal(jax.random.key(seed + 3), -2, 2, (max_seq_len, d_model))
                * 0.02
            )
        kw = dict(relative_attention=relative_attention)
        if share_layers:
            self.layers = nnx.List([TransformerLayer(d_model, n_heads, d_ff, dropout, seed, **kw)])
            self.n_layers = n_layers
        else:
            self.layers = nnx.List(
                [TransformerLayer(d_model, n_heads, d_ff, dropout, seed + i, **kw) for i in range(n_layers)]
            )
            self.n_layers = n_layers
        self.final_ln = nnx.LayerNorm(d_model, rngs=rngs)

    def _project(self, x):
        if x.shape[-1] == self.d_model:
            return x
        if self.in_proj is None:
            if isinstance(x, jax.core.Tracer):
                raise RuntimeError("TransformerBlock not built; run an eager build pass")
            from ..blocks.mlp import Dense

            self.in_proj = Dense(self.d_model, seed=5)
        return self.in_proj(x)

    def __call__(self, inputs, *, training: bool = False, context=None, **kwargs):
        if isinstance(inputs, SequenceFeature):
            x, pad_mask = inputs.values, inputs.mask
        else:
            x, pad_mask = inputs, None
        if x.ndim != 3:
            raise ValueError(f"TransformerBlock expects (B, L, D) input, got {x.shape}")
        B, L, _ = x.shape
        x = self._project(x)
        if self.pos_emb is not None:
            x = x + self.pos_emb.value[None, :L, :]

        # attention mask (B, 1, L, L): padding ∧ (causal)
        if pad_mask is None:
            pad_mask = jnp.ones((B, L), dtype=bool)
        attn = pad_mask[:, None, None, :] & pad_mask[:, None, :, None]
        if self.causal:
            tri = jnp.tril(jnp.ones((L, L), dtype=bool))
            attn = attn & tri[None, None, :, :]

        hidden_states = [x] if self.output_hidden_states else None
        attentions = [] if self.output_attentions else None
        for i in range(self.n_layers):
            layer = self.layers[i % len(self.layers)]
            if attentions is not None:
                attentions.append(layer.attention_weights(x, attn))
            x = layer(x, attn, training=training, context=context)
            if hidden_states is not None:
                hidden_states.append(x)
        x = self.final_ln(x)
        if context is not None:
            if hidden_states is not None:
                context["hidden_states"] = hidden_states
            if attentions is not None:
                context["attentions"] = attentions
        return SequenceFeature(x, pad_mask)


# ---------------------------------------------------------------------------
# named configs mirroring the reference's HF wrappers (transformers/block.py)
# ---------------------------------------------------------------------------

def BertBlock(d_model=64, n_head=4, n_layer=2, **kwargs) -> TransformerBlock:
    return TransformerBlock(d_model, n_head, n_layer, causal=False,
                            block_name="bert", **kwargs)


def RobertaBlock(d_model=64, n_head=4, n_layer=2, **kwargs) -> TransformerBlock:
    return TransformerBlock(d_model, n_head, n_layer, causal=False,
                            block_name="roberta", **kwargs)


def AlbertBlock(d_model=64, n_head=4, n_layer=2, **kwargs) -> TransformerBlock:
    return TransformerBlock(d_model, n_head, n_layer, causal=False, share_layers=True,
                            block_name="albert", **kwargs)


def XLNetBlock(d_model=64, n_head=4, n_layer=2, **kwargs) -> TransformerBlock:
    """Transformer-XL relative positional attention (the architecture that
    distinguishes XLNet from BERT): content/position score decomposition with
    learned u/v biases and sinusoidal relative encodings (reference wraps HF
    XLNet, tf/transformers/block.py:449-530). The permutation-LM two-stream
    training objective is NOT used here — the reference's session role drives
    XLNet with the same masking transforms as BERT (MLM), which needs only
    the content stream."""
    return TransformerBlock(d_model, n_head, n_layer, causal=False,
                            relative_attention=True, block_name="xlnet", **kwargs)


def GPT2Block(d_model=64, n_head=4, n_layer=2, **kwargs) -> TransformerBlock:
    return TransformerBlock(d_model, n_head, n_layer, causal=True,
                            block_name="gpt2", **kwargs)


# ---------------------------------------------------------------------------
# output adapters (reference transformers/transforms.py)
# ---------------------------------------------------------------------------

class LastHiddenState(Block):
    """Identity passthrough of the (B, L, D) hidden states (reference ``:29``)."""

    def __call__(self, inputs, **kwargs):
        return inputs


class TransformerInferenceHiddenState(Block):
    """At inference keep only the last valid position (reference ``:50``);
    during training pass everything through."""

    def __call__(self, inputs, *, training: bool = False, **kwargs):
        if not training and isinstance(inputs, SequenceFeature):
            return sequence_last(inputs)
        return inputs


class PoolerOutput(Block):
    """BERT-style pooler: tanh(Dense(first-position hidden state))
    (reference ``transforms.py:109`` — extracts HF's ``pooler_output``)."""

    def __init__(self, seed: int = 0):
        super().__init__()
        from ..blocks.mlp import Dense

        self.dense = nnx.data(None)
        self.seed = seed

    def __call__(self, inputs, **kwargs):
        from ..blocks.mlp import Dense

        v = inputs.values if isinstance(inputs, SequenceFeature) else inputs
        first = v[:, 0]
        if self.dense is None:
            if isinstance(first, jax.core.Tracer):
                raise RuntimeError("PoolerOutput not built; run an eager build pass")
            self.dense = Dense(first.shape[-1], activation="tanh", seed=self.seed)
        return self.dense(first)


class HiddenStates(Block):
    """All per-layer hidden states (reference ``transforms.py:126``): reads the
    taps a ``TransformerBlock(output_hidden_states=True)`` stashed in context
    and returns ``{"last_hidden_state", "hidden_states"}``."""

    def __call__(self, inputs, *, context=None, **kwargs):
        states = context.get("hidden_states") if context is not None else None
        if states is None:
            raise ValueError(
                "No hidden states in context; build the encoder with "
                "TransformerBlock(output_hidden_states=True)"
            )
        return {"last_hidden_state": inputs, "hidden_states": states}


class AttentionWeights(Block):
    """Per-layer (B, H, L, L) attention weights (reference ``transforms.py:143``):
    reads the taps a ``TransformerBlock(output_attentions=True)`` stashed in
    context and returns ``{"last_hidden_state", "attentions"}``."""

    def __call__(self, inputs, *, context=None, **kwargs):
        attn = context.get("attentions") if context is not None else None
        if attn is None:
            raise ValueError(
                "No attention weights in context; build the encoder with "
                "TransformerBlock(output_attentions=True)"
            )
        return {"last_hidden_state": inputs, "attentions": attn}


class SequenceSummary(Block):
    """Pool the sequence: 'last' | 'mean' | 'cls_index' (reference ``:198-244``)."""

    def __init__(self, summary: str = "last"):
        super().__init__()
        if summary not in ("last", "mean", "cls_index", "first"):
            raise ValueError(f"Unknown summary {summary!r}")
        self.summary = summary

    def __call__(self, inputs, **kwargs):
        if not isinstance(inputs, SequenceFeature):
            return inputs
        if self.summary == "last":
            return sequence_last(inputs)
        if self.summary == "mean":
            return sequence_mean(inputs)
        return inputs.values[:, 0]
