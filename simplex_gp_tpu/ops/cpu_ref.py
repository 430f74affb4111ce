"""ctypes bridge to the C++ golden-model lattice filter (csrc/lattice_ref.cpp).

Lazily compiled at first use (g++ -O3 -shared), mirroring the reference's
lazy ``torch.utils.cpp_extension.load`` (bilateral_kernel.py:62-74) but with
a plain C ABI and no framework dependency.  Used by the cross-backend
differential tests (the reference's experiments/cuda_test.py role).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

__all__ = ["filter_ref", "available"]

_SRC = pathlib.Path(__file__).resolve().parents[2] / "csrc" / "lattice_ref.cpp"
_BUILD = _SRC.parent / "build"
_LIB = _BUILD / "liblattice_ref.so"
_lib = None


def _compile() -> pathlib.Path:
    _BUILD.mkdir(exist_ok=True)
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(_LIB)],
            check=True,
            capture_output=True,
        )
    return _LIB


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(_compile()))
        lib.lattice_filter_ref.restype = ctypes.c_int
        lib.lattice_filter_ref.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # src
            ctypes.POINTER(ctypes.c_float),  # ref
            ctypes.POINTER(ctypes.c_float),  # coeffs
            ctypes.c_int,  # n
            ctypes.c_int,  # d
            ctypes.c_int,  # c
            ctypes.c_int,  # order
            ctypes.c_float,  # blur_variance
            ctypes.POINTER(ctypes.c_float),  # out
        ]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def filter_ref(src: np.ndarray, ref: np.ndarray, coeffs, blur_variance: float) -> np.ndarray:
    """filter(src, ref, coeffs) via the C++ golden model (float32)."""
    lib = _load()
    src = np.ascontiguousarray(src, np.float32)
    ref = np.ascontiguousarray(ref, np.float32)
    cf = np.ascontiguousarray(coeffs, np.float32)
    n, c = src.shape
    d = ref.shape[1]
    assert ref.shape[0] == n
    order = (len(cf) - 1) // 2
    out = np.zeros((n, c), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.lattice_filter_ref(
        src.ctypes.data_as(fp), ref.ctypes.data_as(fp), cf.ctypes.data_as(fp),
        n, d, c, order, ctypes.c_float(blur_variance), out.ctypes.data_as(fp),
    )
    if rc != 0:
        raise RuntimeError(f"lattice_filter_ref failed with code {rc}")
    return out
