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


def _source_path(name: str = "sr_eri") -> str:
    return os.path.join(os.path.dirname(__file__), f"{name}.cpp")


def _build(name: str = "sr_eri") -> str:
    src = _source_path(name)
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(
        os.path.expanduser("~"), ".cache", "deepsolid_tpu"
    )
    os.makedirs(cache, exist_ok=True)
    out = os.path.join(cache, f"{name}_{tag}.so")
    if os.path.exists(out):
        return out
    tmp = tempfile.mktemp(suffix=".so", dir=cache)
    flags = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17"]
    # -march=native vectorizes the image-lane FMAs in the quartet
    # contraction (AVX2/AVX-512); safe because the .so is built on (and
    # cached per) the machine that runs it. Fall back for toolchains
    # without OpenMP and/or -march support.
    for extra in (["-march=native", "-fopenmp"], ["-fopenmp"],
                  ["-march=native"], []):
        try:
            subprocess.run(
                flags + extra + [src, "-o", tmp], check=True,
                capture_output=True,
            )
            break
        except subprocess.CalledProcessError:
            if not extra:
                raise
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
        i32 = ctypes.POINTER(ctypes.c_int32)
        lib.sr_eri_block.restype = ctypes.c_int
        lib.sr_eri_block.argtypes = [
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, d, d, d, d, d, d,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, d, d, d, d, d, d,
            ctypes.c_int64, d, ctypes.c_int64, d,
            ctypes.c_double, ctypes.c_double, d, d,
        ]
        lib.sr_eri_block2.restype = ctypes.c_int
        lib.sr_eri_block2.argtypes = [
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, d, d, d, d, i32, d,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, d, d, d, d, i32, d,
            ctypes.c_int64, d, i32, ctypes.c_int64, d, d,
            ctypes.c_double, ctypes.c_double, d, d,
        ]
        _LIB = lib
    except Exception as e:  # noqa: BLE001 — fall back to numpy path
        logging.info("native sr_eri unavailable (%s); using numpy path", e)
        _LIB = None
    return _LIB


_PAIR_FT = None
_PAIR_FT_TRIED = False


def load_pair_ft():
    """ctypes handle to the pair-FT moment-table kernel, or None."""
    global _PAIR_FT, _PAIR_FT_TRIED
    if _PAIR_FT_TRIED:
        return _PAIR_FT
    _PAIR_FT_TRIED = True
    try:
        lib = ctypes.CDLL(_build("pair_ft"))
        d = ctypes.POINTER(ctypes.c_double)
        lib.pair_ft_r_table.restype = ctypes.c_int
        lib.pair_ft_r_table.argtypes = [
            ctypes.c_int, ctypes.c_int, d, d, d, d, ctypes.c_int64,
            d, d, d, ctypes.c_int64,
            ctypes.c_int, ctypes.c_double, d, d,
        ]
        _PAIR_FT = lib
    except Exception as e:  # noqa: BLE001 — fall back to numpy path
        logging.info("native pair_ft unavailable (%s); using numpy path", e)
        _PAIR_FT = None
    return _PAIR_FT
