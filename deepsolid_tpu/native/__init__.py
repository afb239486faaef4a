"""Native (C++) kernels for host-side setup hot spots.

The reference delegates its integral hot loops to PySCF's libcint (C);
this package plays the same role for the TPU-native SCF: C++ compiled
on first use with g++ into a per-user cache, loaded via ctypes, with
the pure-numpy implementations as automatic fallback (import or
compile failure never breaks the Python path).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile

_LIB = None
_TRIED = False


def _source_path() -> str:
    return os.path.join(os.path.dirname(__file__), "sr_eri.cpp")


def _build() -> str:
    src = _source_path()
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(
        os.path.expanduser("~"), ".cache", "deepsolid_tpu"
    )
    os.makedirs(cache, exist_ok=True)
    out = os.path.join(cache, f"sr_eri_{tag}.so")
    if os.path.exists(out):
        return out
    tmp = tempfile.mktemp(suffix=".so", dir=cache)
    subprocess.run(
        ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", src, "-o", tmp],
        check=True,
        capture_output=True,
    )
    os.replace(tmp, out)
    return out


def load():
    """ctypes handle to the native library, or None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        lib = ctypes.CDLL(_build())
        d = ctypes.POINTER(ctypes.c_double)
        lib.sr_eri_block.restype = ctypes.c_int
        lib.sr_eri_block.argtypes = [
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, d, d, d, d, d, d,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, d, d, d, d, d, d,
            ctypes.c_int64, d, ctypes.c_int64, d,
            ctypes.c_double, ctypes.c_double, d, d,
        ]
        _LIB = lib
    except Exception as e:  # noqa: BLE001 — fall back to numpy path
        logging.info("native sr_eri unavailable (%s); using numpy path", e)
        _LIB = None
    return _LIB
