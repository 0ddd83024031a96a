"""ctypes loader for the native host core (`native/tlfea_native.cpp`).

Compiles the shared library on first use (g++, cached next to the source)
and exposes typed wrappers; every entry point has a NumPy fallback in
`tlfea.utils.coloring`, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["load", "available", "greedy_color", "build_incidence"]

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_SRC, "libtlfea_native.so")
_lib = None
_tried = False


def _compile() -> bool:
    src = os.path.join(_SRC, "tlfea_native.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) or (
        os.path.exists(os.path.join(_SRC, "tlfea_native.cpp"))
        and os.path.getmtime(_LIB_PATH) < os.path.getmtime(os.path.join(_SRC, "tlfea_native.cpp"))
    ):
        if not _compile():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
    lib.tlfea_greedy_color.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p, i32p
    ]
    lib.tlfea_greedy_color.restype = ctypes.c_int32
    lib.tlfea_max_incidence.argtypes = [ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p]
    lib.tlfea_max_incidence.restype = ctypes.c_int32
    lib.tlfea_build_incidence.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p,
        ctypes.c_int32, i32p, u8p,
    ]
    lib.tlfea_build_incidence.restype = ctypes.c_int32
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def greedy_color(conn: np.ndarray, n_coef: int) -> np.ndarray | None:
    """Native greedy coloring; None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    conn = np.ascontiguousarray(conn, dtype=np.int32)
    colors = np.empty(n_coef, dtype=np.int32)
    n = lib.tlfea_greedy_color(n_coef, conn.shape[0], conn.shape[1], conn, colors)
    if n < 0:
        raise ValueError("native coloring failed (bad connectivity)")
    return colors.astype(np.int64)


def build_incidence(conn: np.ndarray, n_coef: int):
    """Native padded incidence; None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    conn = np.ascontiguousarray(conn, dtype=np.int32)
    max_inc = lib.tlfea_max_incidence(n_coef, conn.shape[0], conn.shape[1], conn)
    if max_inc < 0:
        raise ValueError("native incidence failed (bad connectivity)")
    max_inc = max(int(max_inc), 1)
    inc = np.zeros((n_coef, max_inc, 2), dtype=np.int32)
    mask = np.zeros((n_coef, max_inc), dtype=np.uint8)
    rc = lib.tlfea_build_incidence(
        n_coef, conn.shape[0], conn.shape[1], conn, max_inc, inc, mask
    )
    if rc != 0:
        raise ValueError("native incidence overflow")
    return inc, mask.astype(bool)
