"""ctypes bindings for the native (C++) host data-path components.

Falls back gracefully: ``lib()`` returns None when the shared object hasn't
been built; callers keep the numpy path. Build with:
    python -m hydragnn_tpu.native.build
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

_LIB = None
_TRIED = False

_SO_PATH = os.path.join(os.path.dirname(__file__), "libhydragnn_native.so")


def lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        return None
    L = ctypes.CDLL(_SO_PATH)
    i64 = ctypes.c_int64
    L.radius_graph.restype = i64
    L.radius_graph.argtypes = [
        ctypes.c_void_p, i64, ctypes.c_float, i64, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, i64,
    ]
    L.radius_graph_pbc.restype = i64
    L.radius_graph_pbc.argtypes = [
        ctypes.c_void_p, i64, ctypes.c_void_p, ctypes.c_float, i64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        i64,
    ]
    _LIB = L
    return _LIB


def available() -> bool:
    return lib() is not None
