"""Per-block config serialization round-trips — the reference tests
``assert_serialization`` on every block (SURVEY §4); this sweeps the block
vocabulary through the declarative config system."""

import jax.numpy as jnp
import numpy as np
import pytest

from models_tpu.data import generate_data
from models_tpu.schema import Schema, Tags, create_categorical_column
from tests.utils import assert_serialization


@pytest.fixture(scope="module")
def schema():
    return generate_data("e-commerce", num_rows=32).schema


def test_mlp_blocks_roundtrip():
    from models_tpu.blocks.mlp import Dense, DenseResidualBlock, MLPBlock

    assert_serialization(Dense(16, activation="relu"))
    assert_serialization(MLPBlock((32, 16), activation="selu", dropout=0.2))
    assert_serialization(DenseResidualBlock(16))


def test_architecture_blocks_roundtrip(schema):
    from models_tpu.blocks.cross import CrossBlock
    from models_tpu.blocks.dlrm import DLRMBlock
    from models_tpu.blocks.interaction import (
        DotProductInteraction,
        FMPairwiseInteraction,
        XDeepFmOuterProduct,
    )

    assert_serialization(CrossBlock(2))
    assert_serialization(CrossBlock(2, low_rank_dim=4))
    assert_serialization(DotProductInteraction())
    assert_serialization(FMPairwiseInteraction())
    assert_serialization(XDeepFmOuterProduct(8))
    assert_serialization(DLRMBlock(schema, embedding_dim=8, bottom_block=(8,), top_block=(8,)))


def test_expert_blocks_roundtrip():
    from models_tpu.blocks.experts import MMOEBlock

    assert_serialization(MMOEBlock(["a", "b"], expert_block=(8,), num_experts=2))


def test_input_blocks_roundtrip(schema):
    from models_tpu.inputs.base import InputBlockV2
    from models_tpu.inputs.continuous import ContinuousProjection
    from models_tpu.inputs.embedding import EmbeddingTable, Embeddings

    assert_serialization(InputBlockV2(schema, dim=8))
    assert_serialization(Embeddings(schema, dim=8))
    col = create_categorical_column("x", 99)
    t = assert_serialization(EmbeddingTable(8, col))
    assert t.input_dim == 100 and t.dim == 8
    from models_tpu.blocks.mlp import MLPBlock as _MLP

    assert_serialization(ContinuousProjection(schema.continuous, _MLP((8,))))


def test_embedding_table_pretrained_roundtrip():
    from models_tpu.core.config import from_config, to_config
    from models_tpu.inputs.embedding import EmbeddingTable

    rng = np.random.default_rng(0)
    w = rng.standard_normal((50, 8)).astype(np.float32)
    table = EmbeddingTable.from_pretrained(w, name="pre")
    tree, arrays = to_config(table)
    rebuilt = from_config(tree, arrays)
    np.testing.assert_allclose(rebuilt.to_array(), w, rtol=1e-6)


def test_output_heads_roundtrip(schema):
    from models_tpu.outputs.base import BinaryOutput, OutputBlock, RegressionOutput
    from models_tpu.outputs.contrastive import ContrastiveOutput

    assert_serialization(BinaryOutput("click"))
    assert_serialization(RegressionOutput("rating"))
    assert_serialization(OutputBlock(schema))
    assert_serialization(ContrastiveOutput(negative_samplers="in-batch", target="item_id"))


def test_transform_blocks_roundtrip(schema):
    from models_tpu.transforms.bias import PopularityLogitsCorrection
    from models_tpu.transforms.features import CategoryEncoding, HashedCross, ToTarget
    from models_tpu.transforms.negative_sampling import InBatchNegatives
    from models_tpu.transforms.noise import StochasticSwapNoise
    from models_tpu.transforms.regularization import L2Norm

    assert_serialization(L2Norm())
    assert_serialization(StochasticSwapNoise(pad_ratio=0.1))
    assert_serialization(CategoryEncoding(schema.categorical, output_mode="multi_hot"))
    cats = list(schema.categorical)
    sub = Schema(cats[:2])
    assert_serialization(HashedCross(sub, num_bins=64))


def test_sequence_transforms_roundtrip():
    from models_tpu.transforms.sequence import (
        ReplaceMaskedEmbeddings,
        SequenceMaskLast,
        SequenceMaskRandom,
        SequencePredictNext,
    )

    seq_schema = generate_data("sequence-testing", num_rows=16).schema
    assert_serialization(SequencePredictNext(seq_schema, target="item_id_seq"))
    assert_serialization(SequenceMaskRandom(seq_schema, target="item_id_seq", masking_prob=0.3))
    assert_serialization(SequenceMaskLast(seq_schema, target="item_id_seq"))
    assert_serialization(ReplaceMaskedEmbeddings())


def test_transformer_blocks_roundtrip():
    from models_tpu.transformer.block import BertBlock, GPT2Block, TransformerBlock

    assert_serialization(TransformerBlock(d_model=16, n_heads=2, n_layers=1))
    assert_serialization(BertBlock(d_model=16, n_head=2, n_layer=1))
    assert_serialization(GPT2Block(d_model=16, n_head=2, n_layer=1))


def test_combinators_roundtrip():
    from models_tpu.blocks.mlp import Dense
    from models_tpu.core.combinators import ParallelBlock, ResidualBlock, SequentialBlock

    assert_serialization(SequentialBlock([Dense(8), Dense(4)]))
    assert_serialization(ParallelBlock({"a": Dense(8), "b": Dense(8)}))
    assert_serialization(ResidualBlock(Dense(8)))


def test_functional_equality_after_roundtrip(schema):
    """Round-tripped blocks compute identical outputs once state is copied."""
    from flax import nnx

    from models_tpu.blocks.mlp import MLPBlock
    from models_tpu.core.config import from_config, to_config

    block = MLPBlock((16, 8))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 12)), jnp.float32)
    y1 = block(x)
    tree, arrays = to_config(block)
    rebuilt = from_config(tree, arrays)
    rebuilt(x)  # build lazy params
    nnx.update(rebuilt, nnx.state(block))
    y2 = rebuilt(x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)
