"""Native (C++) host-runtime components, bound via ctypes.

Currently: a GIL-free image decoder (libpng/libjpeg -> float32 RGB in [0,1])
with a threaded batch API feeding the data pipeline. Auto-builds with g++ on
first use (cached as ``_image_io.so``); everything degrades gracefully to the
PIL path when a toolchain isn't available (``available()`` gates call sites).

Disable explicitly with ``YANERF_NATIVE=0``.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "src", "image_io.cpp")
_LIB_PATH = osp.join(_HERE, "_image_io.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB_PATH, "-lpng", "-ljpeg", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed or os.environ.get("YANERF_NATIVE", "1") == "0":
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not osp.exists(_LIB_PATH) or osp.getmtime(_LIB_PATH) < osp.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.yanerf_image_dims.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.yanerf_image_dims.restype = ctypes.c_int
        lib.yanerf_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.yanerf_decode_image.restype = ctypes.c_int
        lib.yanerf_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.yanerf_decode_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def image_dims(path: str) -> tuple:
    lib = _load()
    if lib is None:
        raise RuntimeError("native image io unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.yanerf_image_dims(str(path).encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"yanerf_image_dims({path}) failed with {rc}")
    return h.value, w.value


def decode_image(path: str) -> np.ndarray:
    """Decode a PNG/JPEG to float32 RGB in [0, 1], shape (H, W, 3)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native image io unavailable")
    h, w = image_dims(path)
    out = np.empty((h, w, 3), dtype=np.float32)
    rc = lib.yanerf_decode_image(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w
    )
    if rc != 0:
        raise IOError(f"yanerf_decode_image({path}) failed with {rc}")
    return out


def decode_batch(paths: List[str], n_threads: int = 0) -> np.ndarray:
    """Decode same-sized images in parallel -> (N, H, W, 3) float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native image io unavailable")
    if not paths:
        raise ValueError("empty batch")
    h, w = image_dims(paths[0])
    out = np.empty((len(paths), h, w, 3), dtype=np.float32)
    arr = (ctypes.c_char_p * len(paths))(*[str(p).encode() for p in paths])
    rc = lib.yanerf_decode_batch(
        arr, len(paths), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, n_threads
    )
    if rc != 0:
        raise IOError(f"yanerf_decode_batch failed with {rc}")
    return out
