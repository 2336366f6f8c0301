"""ctypes bindings for the native contact-pair parser (fastio.cpp).

Builds the shared library on demand with g++ (cached next to the source);
every entry point degrades to the numpy implementation in
graal_tpu.io.formats when the toolchain or library is unavailable, so the
framework stays importable everywhere.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "fastio.cpp")

_lib = None
_tried = False


def _lib_path() -> str:
    """Cache path keyed by a hash of the source, so a stale binary can never
    shadow newer source (binaries are not committed to the tree)."""
    with open(_SRC, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    return os.path.join(_HERE, "native", f"libfastio-{digest}.so")


class _CooResult(ctypes.Structure):
    _fields_ = [
        ("rows", ctypes.POINTER(ctypes.c_int64)),
        ("cols", ctypes.POINTER(ctypes.c_int64)),
        ("counts", ctypes.POINTER(ctypes.c_int64)),
        ("n", ctypes.c_int64),
        ("total", ctypes.c_int64),
        ("max_id", ctypes.c_int64),
    ]


def _build(lib_path: str) -> bool:
    try:
        tmp = lib_path + ".tmp"
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, lib_path)   # atomic: parallel builders race safely
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if necessary) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    lib_path = _lib_path()
    if not os.path.exists(lib_path) and not _build(lib_path):
        return None
    try:
        lib = ctypes.CDLL(lib_path)
        lib.parse_pairs.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                    ctypes.c_int, ctypes.POINTER(_CooResult)]
        lib.parse_pairs.restype = ctypes.c_int
        lib.free_coo.argtypes = [ctypes.POINTER(_CooResult)]
        lib.free_coo.restype = None
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def _run_native(path: str, one_based: bool, weighted: bool):
    lib = get_lib()
    if lib is None:
        return None
    res = _CooResult()
    rc = lib.parse_pairs(path.encode(), int(one_based), int(weighted),
                         ctypes.byref(res))
    if rc != 0:
        if rc in (-2, -3):
            raise ValueError(
                f"malformed contact file {path!r} (native parser rc={rc})")
        return None
    try:
        n = res.n
        if n == 0:
            return (np.zeros(0, np.int64),) * 3
        rows = np.ctypeslib.as_array(res.rows, shape=(n,)).copy()
        cols = np.ctypeslib.as_array(res.cols, shape=(n,)).copy()
        counts = np.ctypeslib.as_array(res.counts, shape=(n,)).copy()
        return rows, cols, counts
    finally:
        lib.free_coo(ctypes.byref(res))


def raw_pairs_to_coo(pairs_path: str, coo_path: str | None = None):
    """Native-accelerated drop-in for formats.raw_pairs_to_coo."""
    from graal_tpu.io import formats

    out = _run_native(pairs_path, one_based=True, weighted=False)
    if out is None:
        return formats.raw_pairs_to_coo(pairs_path, coo_path)
    rows, cols, counts = out
    if coo_path is not None:
        formats.write_coo(coo_path, rows, cols, counts)
    return rows, cols, counts


def read_coo(path: str):
    """Native-accelerated drop-in for formats.read_coo (0-based weighted)."""
    from graal_tpu.io import formats

    out = _run_native(path, one_based=False, weighted=True)
    if out is None:
        return formats.read_coo(path)
    return out
