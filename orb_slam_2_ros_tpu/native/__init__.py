"""Native (C++) runtime pieces, bound via ctypes.

The compute path is JAX/XLA; these are the host-side runtime components the
reference implements natively (SURVEY.md §2.23 binary vocabulary I/O). Built
with ``make -C orb_slam_2_ros_tpu/native``; a build is attempted on first
use, and callers fall back to the pure-Python implementations when no
toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libslamnative.so")
_lib = None
_tried = False


def load() -> Optional[ctypes.CDLL]:
    """Return the native library, building it on first use; None if
    unavailable (callers must fall back to Python)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    ip = ctypes.POINTER(ctypes.c_int)
    for name in ("parse_orbvoc_bin", "parse_orbvoc_txt"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_long
        fn.argtypes = [ctypes.c_char_p, ip, ip, i32p, u8p, u8p, f64p,
                       ctypes.c_long]
    lib.write_orbvoc_bin.restype = ctypes.c_long
    lib.write_orbvoc_bin.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                     ctypes.c_int, i32p, u8p, u8p, f64p,
                                     ctypes.c_long]
    _lib = lib
    return _lib


def parse_orbvoc(path: str, max_nodes: int = 1_200_000):
    """Parse a DBoW2 vocabulary file (binary or text by extension) with the
    native reader. Returns (k, L, parents, is_leaf, descs, weights) or None
    when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    parents = np.empty(max_nodes, np.int32)
    is_leaf = np.empty(max_nodes, np.uint8)
    descs = np.empty((max_nodes, 32), np.uint8)
    weights = np.empty(max_nodes, np.float64)
    k = ctypes.c_int()
    L = ctypes.c_int()
    fn = (lib.parse_orbvoc_txt if path.endswith(".txt")
          else lib.parse_orbvoc_bin)
    n = fn(path.encode(), ctypes.byref(k), ctypes.byref(L), parents,
           is_leaf, descs, weights, max_nodes)
    if n < 0:
        return None
    return (int(k.value), int(L.value), parents[:n], is_leaf[:n].astype(bool),
            descs[:n], weights[:n])


def write_orbvoc_bin(path: str, k: int, L: int, parents, is_leaf, descs,
                     weights) -> bool:
    lib = load()
    if lib is None:
        return False
    parents = np.ascontiguousarray(parents, np.int32)
    is_leaf = np.ascontiguousarray(is_leaf, np.uint8)
    descs = np.ascontiguousarray(descs, np.uint8)
    weights = np.ascontiguousarray(weights, np.float64)
    n = lib.write_orbvoc_bin(path.encode(), k, L, parents, is_leaf, descs,
                             weights, len(parents))
    return n == len(parents)
