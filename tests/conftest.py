"""Test configuration: force CPU platform with 8 virtual devices so sharding
tests run without TPU hardware (mirrors the reference's degenerate-world-size
strategy for Horovod tests, SURVEY.md §4)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np
import pytest

import jax

# IMPORTANT: the axon TPU plugin ignores the JAX_PLATFORMS env var — the config
# call below is the only way to force tests onto the 8 virtual CPU devices
# (otherwise every tiny test op round-trips through the TPU tunnel at ~0.4s each).
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: makes suite re-runs much faster on this host.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture
def ecommerce_data():
    from models_tpu.data import generate_data
    return generate_data("e-commerce", num_rows=256)


@pytest.fixture
def music_streaming_data():
    from models_tpu.data import generate_data
    return generate_data("music-streaming", num_rows=256)


@pytest.fixture
def sequence_testing_data():
    from models_tpu.data import generate_data
    return generate_data("sequence-testing", num_rows=256)


@pytest.fixture
def testing_data():
    from models_tpu.data import generate_data
    return generate_data("testing", num_rows=256)
