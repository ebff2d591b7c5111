"""ctypes bindings for the native batch-assembly library (fastbatch.cc).

Builds on first import if a compiler is available (cached as fastbatch.so);
consumers fall back to numpy when unavailable. ``pad_ragged`` here is the
C++-backed drop-in for ``loader.pad_ragged``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastbatch.cc")
_LIB = os.path.join(_DIR, "fastbatch.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    for cc in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return True
        except (FileNotFoundError, subprocess.CalledProcessError, subprocess.TimeoutExpired):
            continue
    return False


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for name, ctype in (
        ("pad_ragged_f32", ctypes.c_float),
        ("pad_ragged_i32", ctypes.c_int32),
        ("pad_ragged_i64", ctypes.c_int64),
    ):
        fn = getattr(lib, name)
        fn.argtypes = [
            ctypes.POINTER(ctype), i64p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctype), u8p,
        ]
        fn.restype = None
    _lib = lib
    return _lib


_DTYPES = {
    np.dtype(np.float32): ("pad_ragged_f32", ctypes.c_float),
    np.dtype(np.int32): ("pad_ragged_i32", ctypes.c_int32),
    np.dtype(np.int64): ("pad_ragged_i64", ctypes.c_int64),
}


def pad_ragged(values: np.ndarray, offsets: np.ndarray, max_len: int):
    """Native ragged → (padded, mask); returns None if unsupported/unavailable."""
    lib = load()
    if lib is None:
        return None
    values = np.ascontiguousarray(values)
    if values.dtype not in _DTYPES:
        return None
    width = 1 if values.ndim == 1 else int(np.prod(values.shape[1:]))
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    batch = len(offsets) - 1
    out = np.empty((batch, max_len) + values.shape[1:], dtype=values.dtype)
    mask = np.empty((batch, max_len), dtype=np.uint8)
    fname, ctype = _DTYPES[values.dtype]
    fn = getattr(lib, fname)
    fn(
        values.ctypes.data_as(ctypes.POINTER(ctype)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        batch,
        max_len,
        width,
        out.ctypes.data_as(ctypes.POINTER(ctype)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, mask.astype(bool)
