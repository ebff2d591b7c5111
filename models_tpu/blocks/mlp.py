"""MLP blocks (reference ``merlin/models/tf/blocks/mlp.py:35-434``).

``Dense`` is lazily built: the kernel materializes at the model's single eager
build pass (the engine calls the model once on a sample batch before jitting),
after which all shapes are static. This gives the reference's no-shape-threading
UX without Keras' dynamic ``build()`` machinery inside the compiled graph.

bfloat16 policy: kernels stay float32 (master weights); the matmul runs with
``preferred_element_type=float32`` — on TPU the MXU consumes bf16 inputs natively
when upstream activations are bf16.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.block import Block
from ..core.combinators import SequentialBlock
from ..core.types import SequenceFeature


def get_activation(activation: Union[str, Callable, None]) -> Optional[Callable]:
    if activation is None or callable(activation):
        return activation
    if activation == "linear":
        return None
    try:
        return getattr(jax.nn, activation)
    except AttributeError as e:
        raise ValueError(f"Unknown activation {activation!r}") from e


class LazyMixin:
    """Build-on-first-call support. Param creation must happen eagerly (the engine's
    build pass); calling an unbuilt lazy block under jit tracing is an error."""

    built: bool = False

    def _ensure_built(self, x):
        if self.built:
            return
        if isinstance(x, jax.core.Tracer):
            raise RuntimeError(
                f"{type(self).__name__} is not built. Run model.build(sample_batch) "
                "(or fit/evaluate, which build automatically) before jitting."
            )
        self.build(x)
        self.built = True

    def build(self, x):  # pragma: no cover - overridden
        raise NotImplementedError


class Dense(Block, LazyMixin):
    """Lazily-built dense layer; applies to the last axis, SequenceFeature-aware."""

    def __init__(
        self,
        units: int,
        activation: Union[str, Callable, None] = None,
        use_bias: bool = True,
        kernel_init: str = "glorot_uniform",
        seed: int = 0,
        param_dtype=jnp.float32,
    ):
        super().__init__()
        self.units = int(units)
        # keep strings as strings: resolved at call time so models pickle cleanly
        self.activation = activation
        self.use_bias = use_bias
        self.kernel_init = kernel_init
        self.seed = seed
        self.param_dtype = param_dtype
        self.kernel = nnx.data(None)
        self.bias = nnx.data(None)

    def build(self, x):
        in_features = x.shape[-1]
        init = getattr(nnx.initializers, self.kernel_init)()
        key = jax.random.key(self.seed + in_features)
        self.kernel = nnx.Param(init(key, (in_features, self.units), self.param_dtype))
        if self.use_bias:
            self.bias = nnx.Param(jnp.zeros((self.units,), self.param_dtype))

    def __call__(self, inputs, **kwargs):
        mask = None
        if isinstance(inputs, SequenceFeature):
            mask = inputs.mask
            inputs = inputs.values
        self._ensure_built(inputs)
        from ..core.policy import cast_compute

        out = jnp.matmul(
            cast_compute(inputs),
            cast_compute(self.kernel.value),
            preferred_element_type=jnp.float32,
        )
        if self.bias is not None:
            out = out + self.bias.value
        act = get_activation(self.activation)
        if act is not None:
            out = act(out)
        if mask is not None:
            return SequenceFeature(out, mask)
        return out

    def __repr__(self):
        return f"Dense({self.units}, activation={self.activation})"


class BatchNorm(Block, LazyMixin):
    """Lazily-built batch normalization over the last axis.

    Training mode normalizes with batch statistics and routes the
    running-stat EMA through the engine's functional state-update protocol
    (``context["state_updates"]`` applied by the train body) — NNX forbids
    mutating BatchStat variables under the grad trace, which is exactly what
    ``nnx.BatchNorm`` does.
    """

    _n_instances = 0

    def __init__(self, momentum: float = 0.99, epsilon: float = 1e-3):
        super().__init__()
        self.momentum = momentum
        self.epsilon = epsilon
        self.scale = nnx.data(None)
        self.bias = nnx.data(None)
        self.mean = nnx.data(None)
        self.var = nnx.data(None)
        BatchNorm._n_instances += 1
        self._state_key = f"batch_norm_{BatchNorm._n_instances}"

    def build(self, x):
        d = x.shape[-1]
        self.scale = nnx.Param(jnp.ones((d,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((d,), jnp.float32))
        self.mean = nnx.Variable(jnp.zeros((d,), jnp.float32))
        self.var = nnx.Variable(jnp.ones((d,), jnp.float32))

    def state_update_targets(self):
        return {"mean": self.mean, "var": self.var}

    def __call__(self, inputs, *, training: bool = False, context=None, **kwargs):
        mask = None
        if isinstance(inputs, SequenceFeature):
            mask = inputs.mask
            inputs = inputs.values
        self._ensure_built(inputs)
        if training:
            axes = tuple(range(inputs.ndim - 1))
            batch_mean = jnp.mean(inputs, axis=axes)
            batch_var = jnp.var(inputs, axis=axes)
            mean, var = batch_mean, batch_var
            m = self.momentum
            new_mean = m * self.mean.value + (1 - m) * jax.lax.stop_gradient(batch_mean)
            new_var = m * self.var.value + (1 - m) * jax.lax.stop_gradient(batch_var)
            if context is not None:
                context.setdefault("state_updates", {})[self._state_key] = {
                    "mean": new_mean, "var": new_var,
                }
            else:  # eager call outside any trace
                self.mean.value = new_mean
                self.var.value = new_var
        else:
            mean, var = self.mean.value, self.var.value
        out = (inputs - mean) / jnp.sqrt(var + self.epsilon)
        out = out * self.scale.value + self.bias.value
        if mask is not None:
            return SequenceFeature(out, mask)
        return out


class LayerNorm(Block, LazyMixin):
    def __init__(self, epsilon: float = 1e-6):
        super().__init__()
        self.epsilon = epsilon
        self.ln = nnx.data(None)

    def build(self, x):
        self.ln = nnx.LayerNorm(num_features=x.shape[-1], epsilon=self.epsilon, rngs=nnx.Rngs(0))

    def __call__(self, inputs, **kwargs):
        mask = None
        if isinstance(inputs, SequenceFeature):
            mask = inputs.mask
            inputs = inputs.values
        self._ensure_built(inputs)
        out = self.ln(inputs)
        if mask is not None:
            return SequenceFeature(out, mask)
        return out


class Dropout(Block):
    """Stateless dropout: the key derives from (seed, context step), so the train
    step stays a pure function of its inputs — no NNX RngCount mutation, which
    would be illegal inside the grad trace of the compiled step."""

    def __init__(self, rate: float, seed: int = 0):
        super().__init__()
        self.rate = float(rate)
        self.seed = seed

    def _apply(self, x, step):
        key = jax.random.fold_in(jax.random.key(self.seed), step)
        keep = jax.random.bernoulli(key, 1.0 - self.rate, x.shape)
        return jnp.where(keep, x / (1.0 - self.rate), 0.0)

    def __call__(self, inputs, *, training: bool = False, context=None, **kwargs):
        if not training or self.rate == 0.0:
            return inputs
        step = context.get("step", 0) if context is not None else 0
        step = jnp.asarray(step, dtype=jnp.uint32)
        if isinstance(inputs, SequenceFeature):
            return SequenceFeature(self._apply(inputs.values, step), inputs.mask)
        return self._apply(inputs, step)


def MLPBlock(
    dimensions: Sequence[int],
    activation: Union[str, Callable, None] = "relu",
    use_bias: bool = True,
    dropout: Optional[float] = None,
    normalization: Optional[str] = None,
    no_activation_last_layer: bool = False,
    kernel_init: str = "glorot_uniform",
    seed: int = 0,
    block_name: str = "MLPBlock",
) -> SequentialBlock:
    """Stack of Dense(+BN)(+Dropout) layers (reference ``mlp.py:35``)."""
    layers: List[Block] = []
    n = len(dimensions)
    for i, units in enumerate(dimensions):
        act = None if (no_activation_last_layer and i == n - 1) else activation
        layers.append(
            Dense(units, activation=act, use_bias=use_bias, kernel_init=kernel_init, seed=seed + i)
        )
        if normalization:
            if normalization == "batch_norm":
                layers.append(BatchNorm())
            elif normalization == "layer_norm":
                layers.append(LayerNorm())
            else:
                raise ValueError(f"Unknown normalization {normalization!r}")
        if dropout:
            layers.append(Dropout(dropout, seed=seed + i))
    return SequentialBlock(layers, block_name=block_name)


class DenseResidualBlock(Block):
    """x + Dense(x) with projection if dims differ (reference ``mlp.py:142``)."""

    def __init__(
        self,
        low_rank_dim: Optional[int] = None,
        activation: Union[str, None] = "relu",
        normalization: Optional[str] = "batch_norm",
        seed: int = 0,
    ):
        super().__init__()
        self.low_rank_dim = low_rank_dim
        self.activation = activation
        self.norm = BatchNorm() if normalization == "batch_norm" else None
        self.dense = DenseMaybeLowRank(low_rank_dim=low_rank_dim, seed=seed)

    def __call__(self, inputs, *, training: bool = False, context=None, **kwargs):
        out = self.dense(inputs)
        if self.norm is not None:
            # context must reach BatchNorm: its running-stat updates flow
            # through the functional state-update protocol
            out = self.norm(out, training=training, context=context)
        out = inputs + out
        act = get_activation(self.activation)
        if act is not None:
            out = act(out)
        return out


class DenseMaybeLowRank(Block, LazyMixin):
    """Full-rank d→d dense, or low-rank U(V x) factorization (reference ``mlp.py:304``,
    used by DCN-v2 Cross)."""

    def __init__(self, low_rank_dim: Optional[int] = None, use_bias: bool = True, seed: int = 0):
        super().__init__()
        self.low_rank_dim = low_rank_dim
        self.use_bias = use_bias
        self.seed = seed
        self.u = nnx.data(None)
        self.v = nnx.data(None)
        self.bias = nnx.data(None)

    def build(self, x):
        d = x.shape[-1]
        init = nnx.initializers.glorot_uniform()
        key = jax.random.key(self.seed + d)
        k1, k2 = jax.random.split(key)
        if self.low_rank_dim is not None:
            self.v = nnx.Param(init(k1, (d, self.low_rank_dim), jnp.float32))
            self.u = nnx.Param(init(k2, (self.low_rank_dim, d), jnp.float32))
        else:
            self.u = nnx.Param(init(k1, (d, d), jnp.float32))
        if self.use_bias:
            self.bias = nnx.Param(jnp.zeros((d,), jnp.float32))

    def __call__(self, inputs, **kwargs):
        self._ensure_built(inputs)
        if self.v is not None:
            out = jnp.matmul(
                jnp.matmul(inputs, self.v.value, preferred_element_type=jnp.float32),
                self.u.value,
                preferred_element_type=jnp.float32,
            )
        else:
            out = jnp.matmul(inputs, self.u.value, preferred_element_type=jnp.float32)
        if self.bias is not None:
            out = out + self.bias.value
        return out
