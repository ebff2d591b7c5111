"""Run every example script end-to-end with shrunk data (the reference runs its
notebooks the same way in tests/unit/tf/examples/)."""

import os
import runpy

import pytest

pytestmark = pytest.mark.integration

EXAMPLES = sorted(
    f for f in os.listdir(os.path.join(os.path.dirname(__file__), "..", "..", "examples"))
    if f.endswith(".py")
)


@pytest.fixture(autouse=True)
def restore_dtype_policy():
    """Example 07 flips the global dtype policy; don't leak it into later tests."""
    from models_tpu.core.policy import get_dtype_policy, set_dtype_policy

    before = get_dtype_policy()
    yield
    set_dtype_policy(before)


@pytest.fixture(autouse=True)
def shrink_datasets(monkeypatch):
    import models_tpu.data.datasets as dsets
    import models_tpu.data.synthetic as synth

    orig_gen = synth.generate_data

    def small_gen(input, num_rows=100, **kw):
        return orig_gen(input, num_rows=min(num_rows, 600), **kw)

    monkeypatch.setattr(synth, "generate_data", small_gen)
    monkeypatch.setattr(dsets, "generate_data", small_gen)
    import models_tpu.data as d

    monkeypatch.setattr(d, "generate_data", small_gen)
    import models_tpu

    monkeypatch.setattr(models_tpu, "generate_data", small_gen)

    # clamp batch sizes so examples' production configs fit the shrunk data
    from models_tpu.data.loader import Loader

    orig_init = Loader.__init__

    def small_init(self, dataset, batch_size, *a, **kw):
        orig_init(self, dataset, min(int(batch_size), 64), *a, **kw)

    monkeypatch.setattr(Loader, "__init__", small_init)


@pytest.mark.parametrize("example", EXAMPLES)
def test_example_runs(example):
    path = os.path.join(os.path.dirname(__file__), "..", "..", "examples", example)
    runpy.run_path(path, run_name="__main__")
