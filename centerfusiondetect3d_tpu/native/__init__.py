"""Native host-pipeline kernels (C++ via ctypes), built on first use.

``lib()`` compiles rasterize.cpp with g++ -O3 into a cached shared object and
returns the ctypes handle, or None when no toolchain is available - callers
fall back to the numpy implementations, so the framework stays functional
everywhere while the data loader gets native-speed rasterization where it
matters (this image has 1 CPU core feeding the chip).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "rasterize.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_rasterize.so")
_lock = threading.Lock()
_lib = None
_tried = False


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True, capture_output=True,
                )
            handle = ctypes.CDLL(_SO)
            handle.paint_rects.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ]
            handle.paint_rects_channels.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int,
            ]
            handle.splat_gaussians.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ]
            _lib = handle
        except Exception:
            _lib = None
        return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def paint_rects(depth_map: np.ndarray, boxes: np.ndarray, values: np.ndarray) -> bool:
    """Overwrite-ordered rectangle paint; returns False if native lib missing.

    depth_map: (H, W, C) float32 C-contiguous; boxes: (N, 4) int32
    [y1, y2, x1, x2) exclusive-stop; values: (N, C) float32.
    """
    handle = lib()
    if handle is None:
        return False
    h, w, c = depth_map.shape
    boxes = np.ascontiguousarray(boxes, np.int32)
    values = np.ascontiguousarray(values, np.float32)
    assert depth_map.flags.c_contiguous
    handle.paint_rects(_ptr(depth_map), h, w, c, _ptr(boxes), _ptr(values),
                       len(boxes))
    return True


def paint_rects_channels(depth_map, boxes, values, channels) -> bool:
    handle = lib()
    if handle is None:
        return False
    h, w, c = depth_map.shape
    boxes = np.ascontiguousarray(boxes, np.int32)
    values = np.ascontiguousarray(values, np.float32)
    channels = np.ascontiguousarray(channels, np.int32)
    handle.paint_rects_channels(
        _ptr(depth_map), h, w, c, _ptr(boxes), _ptr(values), _ptr(channels),
        values.shape[1], len(boxes),
    )
    return True


def splat_gaussians(heatmap, centers, radii) -> bool:
    handle = lib()
    if handle is None:
        return False
    h, w = heatmap.shape
    centers = np.ascontiguousarray(centers, np.float32)
    radii = np.ascontiguousarray(radii, np.int32)
    assert heatmap.flags.c_contiguous
    handle.splat_gaussians(_ptr(heatmap), h, w, _ptr(centers), _ptr(radii),
                           len(centers))
    return True
