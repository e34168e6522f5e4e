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
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    lib.decode_gray8.restype = ctypes.c_int
    lib.decode_gray8.argtypes = [ctypes.c_char_p, u8p, ip, ip]
    lib.decode_depth_mm.restype = ctypes.c_int
    lib.decode_depth_mm.argtypes = [ctypes.c_char_p, ctypes.c_double, u16p,
                                    ip, ip]
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_double, ctypes.c_int, ctypes.c_int]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_void_p]
    lib.loader_destroy.restype = None
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
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


def decode_gray8(path: str, max_h: int = 4096,
                 max_w: int = 8192) -> Optional[np.ndarray]:
    """Decode a PNG/PGM/PPM to u8 grayscale with the native decoder (OpenCV
    fixed-point BT.601 conversion, ≙ the reference's cvtColor path,
    ``Tracking.cc:173-276``). None when native is unavailable; raises on
    decode failure."""
    lib = load()
    if lib is None:
        return None
    out = np.empty((max_h, max_w), np.uint8)
    w = ctypes.c_int(max_w)
    h = ctypes.c_int(max_h)
    if lib.decode_gray8(path.encode(), out, ctypes.byref(w),
                        ctypes.byref(h)) != 0:
        raise IOError(f"native decode failed: {path}")
    return np.ascontiguousarray(out.ravel()[:w.value * h.value]
                                .reshape(h.value, w.value))


def decode_depth_mm(path: str, depth_factor: float, max_h: int = 4096,
                    max_w: int = 8192) -> Optional[np.ndarray]:
    """Decode a 16-bit depth PNG to u16 millimetres (wire format):
    mm = raw * 1000 / depth_factor (TUM factor 5000, ``Tracking.cc:151-157``).
    None when native is unavailable; raises on decode failure."""
    lib = load()
    if lib is None:
        return None
    out = np.empty((max_h, max_w), np.uint16)
    w = ctypes.c_int(max_w)
    h = ctypes.c_int(max_h)
    if lib.decode_depth_mm(path.encode(), depth_factor, out, ctypes.byref(w),
                           ctypes.byref(h)) != 0:
        raise IOError(f"native decode failed: {path}")
    return np.ascontiguousarray(out.ravel()[:w.value * h.value]
                                .reshape(h.value, w.value))


MODE_MONO, MODE_RGBD, MODE_STEREO = 0, 1, 2


class Prefetcher:
    """Threaded native prefetch pipeline over a frame-file sequence.

    Worker threads decode upcoming frames into a reusable ring of slots and
    ``next()`` hands them out in order as wire-format arrays (u8 gray plus
    u16-mm depth / u8 right image), so file decode overlaps device compute —
    the engine's replacement for the reference's in-process ROS image
    delivery (``ros/src/RGBDNode.cc:30-35`` synchronized subscribers feeding
    the tracker from the callback thread).
    """

    def __init__(self, paths_a, paths_b, mode: int, width: int, height: int,
                 depth_factor: float = 5000.0, n_threads: int = 4,
                 ring_cap: int = 32):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._n = len(paths_a)
        self.mode = mode
        self.w, self.h = width, height
        pb = "\n".join(paths_b or []).encode()
        self._handle = lib.loader_create(
            "\n".join(paths_a).encode(), pb, mode, width, height,
            depth_factor, n_threads, ring_cap)
        if not self._handle:
            raise RuntimeError("loader_create failed")

    def __len__(self):
        return self._n

    def next(self):
        """(gray u8 (H, W), aux) — aux is u16 mm depth for RGB-D, u8 gray for
        stereo, None for mono. Returns None at end of stream."""
        gray = np.empty((self.h, self.w), np.uint8)
        if self.mode == MODE_RGBD:
            aux = np.empty((self.h, self.w), np.uint16)
        elif self.mode == MODE_STEREO:
            aux = np.empty((self.h, self.w), np.uint8)
        else:
            aux = None
        rc = self._lib.loader_next(
            self._handle, gray.ctypes.data_as(ctypes.c_void_p),
            aux.ctypes.data_as(ctypes.c_void_p) if aux is not None else None)
        if rc == -1:
            return None
        if rc == -2:
            raise IOError("native decode failed mid-stream")
        return gray, aux

    def __iter__(self):
        while True:
            item = self.next()
            if item is None:
                return
            yield item

    def close(self):
        if self._handle:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):   # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


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
