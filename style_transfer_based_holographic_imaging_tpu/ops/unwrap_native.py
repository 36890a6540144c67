"""ctypes binding for the native C++ reliability-sort phase unwrapper.

Compiles ``native/unwrap.cc`` on demand (g++, cached next to the source) and
exposes ``unwrap_phase_native`` with the same (..., H, W) batched signature
as the TPU-side ``ops.unwrap.unwrap_phase``. Use cases:

* golden oracle for the DCT least-squares unwrapper's tests,
* host fallback for pathologically wrapped experimental phases where a
  path-following unwrap is preferable (the role skimage plays for the torch
  reference, utils/functions.py:44-59 — skimage is not available in this
  environment, so the capability is provided natively).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["unwrap_phase_native", "native_available"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "unwrap.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libunwrap.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_error: str | None = None


def _load() -> ctypes.CDLL | None:
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if not os.path.isfile(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                    check=True,
                    capture_output=True,
                    text=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.unwrap2d_batch.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.unwrap2d_batch.restype = ctypes.c_int
            _lib = lib
        except (subprocess.CalledProcessError, OSError) as e:  # pragma: no cover
            _build_error = str(e)
        return _lib


def native_available() -> bool:
    return _load() is not None


def unwrap_phase_native(phase) -> np.ndarray:
    """Unwrap (..., H, W) wrapped phases on the host via the C++ extension."""
    lib = _load()
    if lib is None:  # pragma: no cover
        raise RuntimeError(f"native unwrap unavailable: {_build_error}")
    x = np.ascontiguousarray(np.asarray(phase, np.float32))
    h, w = x.shape[-2], x.shape[-1]
    batch = int(np.prod(x.shape[:-2], dtype=np.int64)) if x.ndim > 2 else 1
    flat = x.reshape(batch, h, w)
    out = np.empty_like(flat)
    rc = lib.unwrap2d_batch(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        batch,
        h,
        w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"unwrap2d_batch failed with code {rc}")
    return out.reshape(x.shape)
