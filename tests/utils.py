"""Shared test harness, modeled on the reference's canonical pattern
(``tf/utils/testing_utils.py:78-140``): fit 1 epoch → save → reload → assert
identical predictions. Serialization round-trip is a first-class behavioral
requirement (SURVEY.md §4)."""

import numpy as np

from models_tpu.data import Dataset, Loader


def model_test(model, data, batch_size: int = 16, epochs: int = 1, tmp_path=None, **compile_kwargs):
    compile_kwargs.setdefault("optimizer", "adam")
    model.compile(**compile_kwargs)
    history = model.fit(data, epochs=epochs, batch_size=batch_size, shuffle=False, verbose=0)
    assert "loss" in history.history
    losses = history.history["loss"]
    assert all(np.isfinite(losses)), f"non-finite loss: {losses}"

    x, _ = Loader(data, batch_size=batch_size).peek()
    preds = model.predict(dict(x))

    if tmp_path is not None:
        path = str(tmp_path / "model")
        model.save(path)
        reloaded = type(model).load(path)
        preds2 = reloaded.predict(dict(x))
        _assert_tree_close(preds, preds2)
        return history, reloaded
    return history, model


def _assert_tree_close(a, b, rtol=1e-5):
    import jax

    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol), a, b
    )


def assert_serialization(block):
    """Config round-trip for a single block (the reference's
    ``assert_serialization``, ``tf/utils/testing_utils.py:44``): encode to the
    declarative config tree, decode in-place, and compare class + captured
    hyperparameters."""
    import json

    from models_tpu.core.config import from_config, to_config

    tree, arrays = to_config(block)
    json.dumps(tree)  # must be pure JSON
    rebuilt = from_config(tree, arrays)
    assert type(rebuilt) is type(block)
    assert rebuilt.block_name == block.block_name
    return rebuilt
