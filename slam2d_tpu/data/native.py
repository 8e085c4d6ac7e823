"""ctypes binding for the native CARMEN parser (native/carmen_parser.cpp).

`load_carmen_log_native(path)` matches the Python loader's contract
(slam2d_tpu/data/carmen.py) but parses with the C++ single-pass parser —
the native data-loader component of the runtime. Falls back with a clear
error if the shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
    )


def _load_lib(build_if_missing: bool = True):
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_native_dir(), "libcarmen_parser.so")
    if build_if_missing:
        # ALWAYS run make (a no-op when fresh): the C ABI has changed
        # across rounds (round 4 added the stamps output) and a stale
        # prebuilt .so would silently return uninitialized arrays. A
        # failed build refuses the native path entirely (the Python
        # fallback takes over) rather than risk an ABI-mismatched lib.
        subprocess.run(
            ["make", "-C", _native_dir()], check=True, capture_output=True
        )
    lib = ctypes.CDLL(so)
    lib.carmen_count.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.carmen_count.restype = ctypes.c_int
    lib.carmen_parse.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.carmen_parse.restype = ctypes.c_int64
    _LIB = lib
    return lib


def native_available() -> bool:
    try:
        _load_lib()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def load_carmen_log_native(path: str):
    """Parse FLASER entries with the C++ parser. Same output contract as
    slam2d_tpu.data.carmen.load_carmen_log."""
    lib = _load_lib()
    n = ctypes.c_int64()
    b = ctypes.c_int64()
    if lib.carmen_count(path.encode(), ctypes.byref(n), ctypes.byref(b)) != 0:
        raise IOError(f"cannot open {path}")
    if n.value == 0 or b.value == 0:
        raise ValueError(f"no FLASER entries in {path}")
    odom = np.empty((n.value, 3), np.float32)
    ranges = np.empty((n.value, b.value), np.float32)
    stamps = np.empty(n.value, np.float64)
    rows = lib.carmen_parse(
        path.encode(),
        odom.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ranges.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n.value,
        b.value,
        stamps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rows < 0:
        raise IOError(f"parse failed for {path}")
    if rows == 0:
        # parity with the Python loader: all rows malformed => error, not
        # silently-empty arrays
        raise ValueError(f"no parseable FLASER entries in {path}")
    return {
        "odom": odom[:rows],
        "ranges": ranges[:rows],
        "stamps": stamps[:rows],
    }
