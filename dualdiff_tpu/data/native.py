"""ctypes bindings for the native C++ data-path (``native/dualdiff_native.cc``).

Auto-builds the shared library on first use when a compiler is available;
callers fall back to the pure-python path when it isn't.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional

import numpy as np

log = logging.getLogger(__name__)

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libdualdiff_native.so"))
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception as e:  # no compiler / libjpeg — python fallback
            log.info("native lib unavailable (%s); using python data path", e)
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError as e:
        log.info("native lib load failed (%s); using python data path", e)
        return None
    lib.unpack_masks.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
    lib.pack_masks.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint32)]
    lib.load_images_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_float,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.load_images_batch.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def unpack_masks(packed: np.ndarray, channels: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, np.uint32)
    h, w = packed.shape
    out = np.empty((channels, h, w), np.uint8)
    lib.unpack_masks(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        channels, h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def pack_masks(masks: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    masks = np.ascontiguousarray(masks, np.uint8)
    c, h, w = masks.shape
    out = np.empty((h, w), np.uint32)
    lib.pack_masks(
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        c, h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return out


def load_images_batch(paths: List[str], ratio: float, out_h: int, out_w: int,
                      num_threads: int = 6) -> Optional[np.ndarray]:
    """Decode + resize + bottom-crop + normalize N JPEGs in parallel.
    -> (N, out_h, out_w, 3) float32 in [-1, 1], or None (fallback needed)."""
    lib = _load()
    if lib is None:
        return None
    if not all(p.lower().endswith((".jpg", ".jpeg")) for p in paths):
        return None  # non-JPEG: python path
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.load_images_batch(
        arr, n, ctypes.c_float(ratio), out_h, out_w, num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if failures:
        log.warning("native decode failed for %d/%d images", failures, n)
        return None
    return out
