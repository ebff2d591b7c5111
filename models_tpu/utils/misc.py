"""Misc utilities (reference ``merlin/models/utils/misc_utils.py``)."""

from __future__ import annotations

import time
from contextlib import contextmanager


@contextmanager
def Timing(label: str = "", log_fn=print):
    """Context timer (reference ``Timing:119``)."""
    t0 = time.perf_counter()
    result = {"seconds": None}
    try:
        yield result
    finally:
        result["seconds"] = time.perf_counter() - t0
        if label:
            log_fn(f"{label}: {result['seconds']:.3f}s")
