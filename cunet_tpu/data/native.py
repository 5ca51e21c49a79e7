"""ctypes bindings for the native host library (native/cunet_host.cc).

Builds ``libcunet_host.so`` with g++ on first use (cached under
``native/build/``) and exposes the fused affine crop + heatmap renderer.
Falls back to the pure-Python implementations when no compiler is available,
so the package works everywhere; the native path is the production loader.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "cunet_host.cc")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_SO = os.path.join(_BUILD_DIR, "libcunet_host.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", _SO, _SRC, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        # -march=native can fail on exotic hosts; retry generic
        try:
            cmd.remove("-march=native")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.affine_crop_bilinear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.render_heatmaps.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_double, ctypes.POINTER(ctypes.c_float),
        ]
        lib.cunet_host_abi_version.restype = ctypes.c_int
        assert lib.cunet_host_abi_version() == 1
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def affine_crop_native(
    img: np.ndarray, inv_t: np.ndarray, res: int
) -> Optional[np.ndarray]:
    """Fused bilinear warp: ``inv_t`` maps crop coords -> source coords.
    img HWC float32 [0,1]. Returns None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    out = np.empty((res, res, c), np.float32)
    inv9 = np.ascontiguousarray(inv_t, np.float64).reshape(9)
    lib.affine_crop_bilinear(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, c,
        inv9.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), res,
    )
    return out


def render_heatmaps_native(
    pts: np.ndarray, height: int, width: int, sigma: float = 1.0
) -> Optional[np.ndarray]:
    """Bit-compatible native heatmap renderer; None if lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts, np.float64)
    out = np.empty((height, width, pts.shape[0]), np.float32)
    lib.render_heatmaps(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), pts.shape[0],
        height, width, float(sigma),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def crop_fast(img: np.ndarray, center, scale, rot, res: int, size: int = 200):
    """Native one-pass crop using the inverse crop affine. Float path (no
    uint8 round-trips) — use the PIL compat path for parity evals."""
    from cunet_tpu.geometry import get_transform

    t = get_transform(np.asarray(center, float), float(np.asarray(scale).reshape(-1)[0]),
                      float(np.asarray(rot).reshape(-1)[0]), res, size)
    inv_t = np.linalg.inv(t)
    return affine_crop_native(img, inv_t, res)
