"""Native (C++) runtime helpers with on-demand compilation.

``swap_axes_cast`` is the host-side ingest hot loop: the FLASH
(nb, nz, ny, nx) -> (nb, nx, ny, nz) axis swap with a fused dtype cast.
The shared library is built once with g++ -O3 into this directory and
loaded via ctypes; without a compiler the NumPy fallback is used.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_HERE = Path(__file__).parent
_SRC = _HERE / "transpose.cpp"
_SO = _HERE / "_fava_native.so"
_LIB: Optional[ctypes.CDLL] = None
_LOCK = threading.Lock()
_TRIED = False

_FUNCS = {
    (np.dtype(np.float32), np.dtype(np.float32)): "swap_f32_f32",
    (np.dtype(np.float32), np.dtype(np.float64)): "swap_f32_f64",
    (np.dtype(np.float64), np.dtype(np.float64)): "swap_f64_f64",
    (np.dtype(np.float64), np.dtype(np.float32)): "swap_f64_f32",
}


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                "-std=c++17",
                "-pthread",
                str(_SRC),
                "-o",
                str(_SO),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as exc:  # pragma: no cover - depends on toolchain
        logger.warning("Could not build native transpose library: %s", exc)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        # A packaged tree may ship the .so without the source; only
        # consider a rebuild when the source is present.
        stale = _SRC.is_file() and _SO.is_file() and _SO.stat().st_mtime < _SRC.stat().st_mtime
        if not _SO.is_file() or stale:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
            for name in set(_FUNCS.values()):
                fn = getattr(lib, name)
                fn.restype = None
                fn.argtypes = [
                    ctypes.c_void_p,
                    ctypes.c_void_p,
                    ctypes.c_long,
                    ctypes.c_long,
                    ctypes.c_long,
                    ctypes.c_long,
                    ctypes.c_long,
                ]
            _LIB = lib
        except Exception as exc:  # pragma: no cover
            logger.warning("Could not load native transpose library: %s", exc)
        return _LIB


def native_available() -> bool:
    return _load() is not None


def swap_axes_cast(src: np.ndarray, dtype=np.float64, nthreads: Optional[int] = None) -> np.ndarray:
    """(..., nz, ny, nx) -> (..., nx, ny, nz) contiguous, cast to ``dtype``.

    Fused single-pass replacement for
    ``ascontiguousarray(swapaxes(src.astype(dtype), -1, -3))``
    (reference behavior: fava/mesh/FLASH/_flash.py:332-334).
    """
    dtype = np.dtype(dtype)
    src = np.ascontiguousarray(src)
    if src.ndim == 3:
        nb, (nz, ny, nx) = 1, src.shape
        out_shape = (nx, ny, nz)
    elif src.ndim == 4:
        nb, nz, ny, nx = src.shape
        out_shape = (nb, nx, ny, nz)
    else:
        raise ValueError("swap_axes_cast expects a 3D or 4D array")

    lib = _load()
    key = (src.dtype, dtype)
    if lib is None or key not in _FUNCS:
        return np.ascontiguousarray(np.swapaxes(src.astype(dtype), -1, -3))

    dst = np.empty(out_shape, dtype=dtype)
    if nthreads is None:
        nthreads = min(nb, os.cpu_count() or 1)
    getattr(lib, _FUNCS[key])(
        src.ctypes.data_as(ctypes.c_void_p),
        dst.ctypes.data_as(ctypes.c_void_p),
        nb,
        nz,
        ny,
        nx,
        max(1, nthreads),
    )
    return dst
