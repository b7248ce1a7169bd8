"""ctypes loader for the native C++ I/O helpers (csrc/io_native.cpp).

Builds the shared library on first import if g++ is available and the
binary is missing/stale; falls back silently (callers check for None /
catch ImportError) so the pure-Python paths keep working everywhere.
"""

import ctypes
import os
import subprocess

import numpy as np

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_PKG_DIR, "..", "csrc", "io_native.cpp")
_LIB = os.path.join(_PKG_DIR, "_io_native.so")


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    if (not os.path.exists(_LIB)
            or (os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB))):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.parse_records.restype = ctypes.c_int64
    lib.parse_records.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64]
    lib.count_tokens.restype = ctypes.c_int64
    lib.count_tokens.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    return lib


_lib = _load()


def parse_integral_lines(body, ints_per_rec=4):
    """Parse '<float> <int>*k' records from a text body into
    (values (n,), indices (n, k)) numpy arrays.

    Raises ValueError when the body does not tokenize into an exact
    number of records or the C parser stopped early (e.g. stray text) —
    a silent partial parse would mean silently wrong integrals; callers
    fall back to the loud pure-numpy path.
    """
    raw = body.encode() if isinstance(body, str) else body
    n_tok = _lib.count_tokens(raw, len(raw))
    if n_tok % (1 + ints_per_rec) != 0:
        raise ValueError(
            f"integral body has {n_tok} tokens, not a multiple of "
            f"{1 + ints_per_rec}")
    cap = n_tok // (1 + ints_per_rec) + 1
    vals = np.empty(cap, dtype=np.float64)
    idx = np.empty(cap * ints_per_rec, dtype=np.int64)
    n = _lib.parse_records(
        raw, len(raw), ints_per_rec,
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap)
    if n != n_tok // (1 + ints_per_rec):
        raise ValueError(
            f"native parser stopped after {n} of "
            f"{n_tok // (1 + ints_per_rec)} records (malformed token)")
    return vals[:n], idx[: n * ints_per_rec].reshape(n, ints_per_rec)
