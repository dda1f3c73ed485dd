"""ctypes loader for the native host kernels (placeholder until built).

The shared library is compiled on demand by ``msa_tpu/native/build.py``.
Until it exists, the numpy oracle is used transparently.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "libmsanative.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        try:
            from msa_tpu.native.build import build

            build()
        except Exception:
            return None
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            _configure(lib)
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def _configure(lib: ctypes.CDLL) -> None:
    import numpy as np  # noqa: F401

    lib.nw_score.restype = ctypes.c_int
    lib.nw_score.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.nw_align.restype = ctypes.c_int
    lib.nw_align.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_char_p,  # out align1 buffer (m+n+1)
        ctypes.c_char_p,  # out align2 buffer
        ctypes.POINTER(ctypes.c_int),  # out aligned length
    ]


def native_available() -> bool:
    return _load() is not None


def nw_score_native(x: str, y: str, pxy: int, pgap: int) -> int:
    lib = _load()
    if lib is None:
        from msa_tpu.ops.reference import nw_score_numpy

        return nw_score_numpy(x, y, pxy, pgap)
    return int(
        lib.nw_score(x.encode(), len(x), y.encode(), len(y), pxy, pgap)
    )


def nw_align_native(
    x: str, y: str, pxy: int, pgap: int
) -> Tuple[int, str, str]:
    lib = _load()
    if lib is None:
        from msa_tpu.ops.reference import nw_align_numpy

        return nw_align_numpy(x, y, pxy, pgap)
    m, n = len(x), len(y)
    buf1 = ctypes.create_string_buffer(m + n + 1)
    buf2 = ctypes.create_string_buffer(m + n + 1)
    out_len = ctypes.c_int(0)
    penalty = lib.nw_align(
        x.encode(), m, y.encode(), n, pxy, pgap, buf1, buf2,
        ctypes.byref(out_len),
    )
    la = out_len.value
    return (
        int(penalty),
        buf1.raw[:la].decode("latin-1"),
        buf2.raw[:la].decode("latin-1"),
    )

