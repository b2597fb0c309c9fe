"""ctypes bindings for the native batch RS codec (rs_codec.cpp).

The shared library is built lazily on first use with the system g++
(no pip/pybind11 dependency) and cached next to this file; set
METAVITERBINET_NO_NATIVE=1 to disable and fall back to the jax codec.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rs_codec.cpp")
_LIB = os.path.join(_DIR, "_rs_codec.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    if os.environ.get("METAVITERBINET_NO_NATIVE") == "1":
        _build_error = "disabled by METAVITERBINET_NO_NATIVE"
        return None
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.isfile(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", _LIB, _SRC],
                    check=True, capture_output=True, text=True, timeout=120,
                )
            except Exception as e:  # missing compiler, bad flags, ...
                _build_error = f"native build failed: {e}"
                return None
        lib = ctypes.CDLL(_LIB)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.rs_encode_batch.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int]
        lib.rs_decode_batch.argtypes = [u8p, u8p, u8p, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def rs_encode_bytes_batch(msgs: np.ndarray, nsym: int) -> np.ndarray:
    """msgs [count, k] uint8 -> codewords [count, k+nsym] uint8."""
    lib = _load()
    if lib is None:
        raise RuntimeError(_build_error or "native codec unavailable")
    msgs = np.ascontiguousarray(msgs, dtype=np.uint8)
    count, k = msgs.shape
    out = np.empty((count, k + nsym), dtype=np.uint8)
    lib.rs_encode_batch(_u8p(msgs), _u8p(out), count, k, nsym)
    return out


def rs_decode_bytes_batch(rxs: np.ndarray, nsym: int
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """rxs [count, n] uint8 -> (messages [count, n-nsym], flags [count])."""
    lib = _load()
    if lib is None:
        raise RuntimeError(_build_error or "native codec unavailable")
    rxs = np.ascontiguousarray(rxs, dtype=np.uint8)
    count, n = rxs.shape
    out = np.empty((count, n - nsym), dtype=np.uint8)
    flags = np.empty((count,), dtype=np.uint8)
    lib.rs_decode_batch(_u8p(rxs), _u8p(out), _u8p(flags), count, n, nsym)
    return out, flags
