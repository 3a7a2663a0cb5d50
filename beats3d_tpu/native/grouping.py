"""ctypes binding for the native grouping library, with build-on-demand.

Reference analogue: src/cpp_grouping/ (C++ BFS + Cython wrapper,
cpp_grouping.pyx:7-23).  We bind a plain C ABI with ctypes instead of Cython:
no build-time Python dependency, and the .so builds in one compiler call.
Falls back to a pure-numpy BFS when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libbeats3d_native.so")
_lib = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _HERE, "-s"], check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.make_groups.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_float),
            ctypes.c_float,
        ]
        lib.make_groups.restype = None
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def make_groups_native(depth: np.ndarray, pct_thresh: float
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Native BFS grouping. depth: (H, W) uint16.
    Returns (groups (H, W) uint16 with 1=right/2=left, g_info (2, 3) f32)."""
    lib = _load()
    h, w = depth.shape
    depth = np.ascontiguousarray(depth, dtype=np.uint16)
    groups = np.zeros((h, w), dtype=np.uint16)
    g_info = np.zeros((2, 3), dtype=np.float32)
    if lib is None:
        return _make_groups_py(depth, pct_thresh)
    lib.make_groups(
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.c_int(h), ctypes.c_int(w),
        groups.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        g_info.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(pct_thresh),
    )
    return groups, g_info


def _make_groups_py(depth: np.ndarray, pct_thresh: float):
    """Pure-numpy fallback (scipy-free BFS)."""
    h, w = depth.shape
    seen = np.zeros((h, w), dtype=bool)
    best = {0: ([], 0.0, 0.0), 1: ([], 0.0, 0.0)}
    for y0 in range(h):
        for x0 in range(w):
            if seen[y0, x0] or depth[y0, x0] == 0:
                continue
            seen[y0, x0] = True
            queue = [(y0, x0)]
            qi = 0
            sx = sy = 0
            while qi < len(queue):
                y, x = queue[qi]
                qi += 1
                sx += x
                sy += y
                for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                    ny, nx = y + dy, x + dx
                    if 0 <= ny < h and 0 <= nx < w and not seen[ny, nx]:
                        seen[ny, nx] = True
                        if depth[ny, nx]:
                            queue.append((ny, nx))
            if len(queue) / (h * w) <= pct_thresh:
                continue
            cx = sx / len(queue)
            cy = sy / len(queue)
            side = 0 if cx < w / 2.0 else 1
            if len(queue) > len(best[side][0]):
                best[side] = (queue, cx, cy)
    groups = np.zeros((h, w), dtype=np.uint16)
    g_info = np.zeros((2, 3), dtype=np.float32)
    for side in (0, 1):
        comp, cx, cy = best[side]
        for (y, x) in comp:
            groups[y, x] = side + 1
        g_info[side] = (len(comp), cx, cy)
    return groups, g_info


class CppGrouping:
    """Drop-in class mirroring the reference wrapper's call shape
    (cpp_grouping.pyx:13-23)."""

    def make_groups(self, img: np.ndarray, pct_thresh: float):
        return make_groups_native(img, pct_thresh)
