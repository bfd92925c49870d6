"""ctypes loader for the native batch-assembly library.

Compiles ``_native/batchops.cpp`` once (g++ -O3 -shared) into a cache
directory and binds it with ctypes (this image ships no pybind11 —
plain C ABI instead).  Every entry point has a numpy fallback, so the
framework works even where no compiler exists; the native path is a
host-throughput optimization, not a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "_native", "batchops.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> str:
    d = os.environ.get("SMMDAX_BUILD_DIR") or os.path.join(
        tempfile.gettempdir(), "smmdax_native")
    os.makedirs(d, exist_ok=True)
    return d


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so_path = os.path.join(_build_dir(), "batchops.so")
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", "-pthread", _SRC, "-o", so_path],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        lib.gather_normalize.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32]
        lib.gather_normalize.restype = None
        _LIB = lib
    except Exception as e:                                  # no g++, etc.
        print(f"[smmdax.native] native batchops unavailable ({e}); "
              "using numpy fallback")
        _LIB = None
    return _LIB


def gather_normalize(data_u8: np.ndarray, idx: np.ndarray,
                     flips: Optional[np.ndarray] = None,
                     nthreads: Optional[int] = None) -> np.ndarray:
    """out[i] = (data[idx[i]] - 127.5)/127.5, optionally h-flipped.

    data_u8: (N, H, W, C) or (N, elems) uint8.  Returns float32 with
    the sample shape of ``data_u8``.
    """
    assert data_u8.dtype == np.uint8
    n = len(idx)
    sample_shape = data_u8.shape[1:]
    elems = int(np.prod(sample_shape))
    lib = _load()
    if lib is None:
        out = (data_u8[idx].astype(np.float32) - 127.5) / 127.5
        if flips is not None:
            assert len(sample_shape) == 3
            out[flips.astype(bool)] = out[flips.astype(bool)][:, :, ::-1, :]
        return out

    if len(sample_shape) == 3:
        h, w, c = sample_shape
    else:
        h, w, c = 1, 1, elems
        assert flips is None, "flips need (H, W, C) samples"
    data_c = np.ascontiguousarray(data_u8)
    idx_c = np.ascontiguousarray(idx, dtype=np.int64)
    flips_c = (np.ascontiguousarray(flips, dtype=np.uint8)
               if flips is not None else None)
    out = np.empty((n,) + tuple(sample_shape), np.float32)
    nthreads = nthreads or min(8, os.cpu_count() or 1)
    lib.gather_normalize(
        data_c.ctypes.data_as(ctypes.c_void_p),
        idx_c.ctypes.data_as(ctypes.c_void_p),
        flips_c.ctypes.data_as(ctypes.c_void_p) if flips_c is not None else None,
        ctypes.c_int64(n), ctypes.c_int64(elems),
        ctypes.c_int64(h), ctypes.c_int64(w), ctypes.c_int64(c),
        out.ctypes.data_as(ctypes.c_void_p), ctypes.c_int32(nthreads))
    return out
