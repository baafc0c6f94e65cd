"""Native (C++) host-side preprocessing with ctypes bindings.

The shared library is built on demand with g++ (no pybind11 dependency) and
cached next to the source; every entry point has a numpy fallback in
data/raw_process.py, so environments without a toolchain lose speed, not
capability.  Parity between the two implementations is pinned by
tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = [
    "available",
    "binarize_depth_native",
    "extract_contact_seqs_native",
    "resize_bilinear_native",
]

logger = logging.getLogger("tactilesr_tpu")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "preprocess.cpp")
_LIB_PATH = os.path.join(_HERE, "_libtsr_preprocess.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _build() -> Optional[str]:
    try:
        if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
            return _LIB_PATH
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC",
            "-o", _LIB_PATH, _SRC,
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception as exc:  # pragma: no cover - toolchain-less envs
        logger.debug("native preprocess build failed: %s", exc)
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.tsr_resize_bilinear.argtypes = [
            _f32p, ctypes.c_int, ctypes.c_int, _f32p, ctypes.c_int, ctypes.c_int,
        ]
        lib.tsr_resize_bilinear.restype = None
        lib.tsr_binarize_depth.argtypes = [
            _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, _f32p,
        ]
        lib.tsr_binarize_depth.restype = None
        lib.tsr_extract_contact_seqs.argtypes = [
            _f32p, ctypes.c_int, ctypes.c_float, ctypes.c_int, _f32p,
        ]
        lib.tsr_extract_contact_seqs.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def resize_bilinear_native(src: np.ndarray, out_hw) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    src = np.ascontiguousarray(src, np.float32)
    out = np.empty(out_hw, np.float32)
    lib.tsr_resize_bilinear(src, src.shape[0], src.shape[1], out, out_hw[0], out_hw[1])
    return out


def binarize_depth_native(depth: np.ndarray, depth_pixel: int = 100) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    depth = np.ascontiguousarray(depth, np.float32)
    out = np.empty((depth_pixel, depth_pixel), np.float32)
    lib.tsr_binarize_depth(depth, depth.shape[0], depth.shape[1], depth_pixel, out)
    return out


def extract_contact_seqs_native(
    tactile_lrs: np.ndarray, threshold_scale: float = 0.1, sample_count: int = -1
) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    lrs = np.ascontiguousarray(tactile_lrs, np.float32)
    seqs = lrs.shape[0]
    out = np.empty((seqs, 3, 4, 4), np.float32)
    n = lib.tsr_extract_contact_seqs(
        lrs, seqs, np.float32(threshold_scale), int(sample_count), out
    )
    return np.ascontiguousarray(out[:n])
