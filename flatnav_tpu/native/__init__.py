"""ctypes bindings for the native runtime library.

Loads libflatnav_native.so (built by build_native.sh; auto-built on first
import when a compiler is available). All entry points have pure-Python
fallbacks — `available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_LIB_DIR, "libflatnav_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_LIB_DIR, "flatnav_native.cpp")
    stale = (
        not os.path.exists(_LIB_PATH)
        or (os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
    )
    if stale:
        # rebuild on source changes too, not just on a missing .so — a
        # stale library silently runs old code against new argtypes
        try:
            subprocess.run(
                ["bash", os.path.join(_LIB_DIR, "build_native.sh")],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None  # no library at all; else fall through stale
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.fn_gorder.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i32p
    ]
    lib.fn_gorder.restype = ctypes.c_int
    lib.fn_rcm.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, i32p]
    lib.fn_rcm.restype = ctypes.c_int
    lib.fn_read_mtx.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, i32p
    ]
    lib.fn_read_mtx.restype = ctypes.c_int64
    lib.fn_npy_header.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_char_p,
    ]
    lib.fn_npy_header.restype = ctypes.c_int
    lib.fn_npy_read.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64
    ]
    lib.fn_npy_read.restype = ctypes.c_int
    lib.fn_npy_write.argtypes = [
        ctypes.c_char_p,
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_char_p,
        ctypes.c_int64,
    ]
    lib.fn_npy_write.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def gorder(links: np.ndarray, n: int, window_size: int = 5) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    links = np.ascontiguousarray(links[:n], dtype=np.int32)
    perm = np.empty(n, np.int32)
    if lib.fn_gorder(links, n, links.shape[1], window_size, perm) != 0:
        return None
    return perm


def rcm_order(links: np.ndarray, n: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    links = np.ascontiguousarray(links[:n], dtype=np.int32)
    perm = np.empty(n, np.int32)
    if lib.fn_rcm(links, n, links.shape[1], perm) != 0:
        return None
    return perm


def read_mtx(path: str, n: int, m: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    links = np.empty((n, m), np.int32)
    applied = lib.fn_read_mtx(path.encode(), n, m, links)
    if applied < 0:
        return None
    return links


_NPY_DESCRS = {
    "f4": (np.float32, b"<f4"),
    "u1": (np.uint8, b"|u1"),
    "i1": (np.int8, b"|i1"),
    "i4": (np.int32, b"<i4"),
}


def npy_read(path: str) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    n = ctypes.c_int64()
    d = ctypes.c_int64()
    dtype_buf = ctypes.create_string_buffer(8)
    if lib.fn_npy_header(path.encode(), ctypes.byref(n), ctypes.byref(d), dtype_buf) != 0:
        return None
    dtype, _ = _NPY_DESCRS[dtype_buf.value.decode()]
    out = np.empty((n.value, d.value), dtype)
    if lib.fn_npy_read(path.encode(), out.ctypes.data_as(ctypes.c_void_p), out.nbytes) != 0:
        return None
    return out


def npy_write(path: str, arr: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    if arr.ndim > 2:
        raise ValueError(
            f"npy_write handles 1-D/2-D arrays, got shape {arr.shape}"
        )
    arr = np.ascontiguousarray(arr)
    key = {"float32": "f4", "uint8": "u1", "int8": "i1", "int32": "i4"}.get(
        arr.dtype.name
    )
    if key is None:
        return False
    _, descr = _NPY_DESCRS[key]
    n, d = arr.shape if arr.ndim == 2 else (arr.shape[0], 1)
    return (
        lib.fn_npy_write(
            path.encode(),
            arr.ctypes.data_as(ctypes.c_void_p),
            n,
            d,
            descr,
            arr.itemsize,
        )
        == 0
    )
