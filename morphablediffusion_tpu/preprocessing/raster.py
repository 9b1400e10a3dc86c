"""Depth rasterization for preprocessing (mask + visibility rendering).

Replaces the reference's pyrender/EGL `render_cvcam`
(preprocessing/facescape/renderer.py): a cv-convention pinhole projection in
numpy feeds the native C++ z-buffer rasterizer (native/rasterizer.cpp via
ctypes); a vectorized numpy fallback keeps things working where the shared
library has not been built.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    root = Path(__file__).resolve().parents[2]
    for cand in [
        os.environ.get("MDTPU_RASTER_LIB"),
        root / "native" / "libmdtpu_raster.so",
    ]:
        if cand and Path(cand).is_file():
            lib = ctypes.CDLL(str(cand))
            lib.rasterize_depth.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.rasterize_depth.restype = None
            _LIB = lib
            break
    return _LIB


def rasterize_depth_px(
    verts_px: np.ndarray, tris: np.ndarray, h: int, w: int
) -> np.ndarray:
    """verts_px: (N, 3) [x_px, y_px, z_cam] float; tris: (M, 3) int.
    Returns (h, w) float32 depth map, 0 = background."""
    verts_px = np.ascontiguousarray(verts_px, dtype=np.float32)
    tris = np.ascontiguousarray(tris, dtype=np.int32)
    lib = _load_lib()
    if lib is not None:
        out = np.zeros((h, w), dtype=np.float32)
        lib.rasterize_depth(
            verts_px.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(len(verts_px)),
            tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(len(tris)),
            ctypes.c_int32(h), ctypes.c_int32(w),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out
    return _rasterize_depth_numpy(verts_px, tris, h, w)


def _rasterize_depth_numpy(verts_px, tris, h, w) -> np.ndarray:
    """Pure-numpy fallback: per-triangle bbox walk with a z-buffer."""
    zbuf = np.full((h, w), np.inf, dtype=np.float32)
    v = verts_px[tris]  # (M, 3, 3)
    valid = np.all(v[..., 2] > 0, axis=1)
    for a, b, c in v[valid]:
        x0 = max(0, int(np.floor(min(a[0], b[0], c[0]))))
        x1 = min(w - 1, int(np.ceil(max(a[0], b[0], c[0]))))
        y0 = max(0, int(np.floor(min(a[1], b[1], c[1]))))
        y1 = min(h - 1, int(np.ceil(max(a[1], b[1], c[1]))))
        if x0 > x1 or y0 > y1:
            continue
        area = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if abs(area) < 1e-12:
            continue
        xs = np.arange(x0, x1 + 1) + 0.5
        ys = np.arange(y0, y1 + 1) + 0.5
        px, py = np.meshgrid(xs, ys)
        w0 = ((b[0] - a[0]) * (py - a[1]) - (b[1] - a[1]) * (px - a[0])) / area
        w1 = ((c[0] - b[0]) * (py - b[1]) - (c[1] - b[1]) * (px - b[0])) / area
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        iz = w1 / a[2] + w2 / b[2] + w0 / c[2]
        with np.errstate(divide="ignore"):
            z = np.where(iz > 0, 1.0 / np.maximum(iz, 1e-30), np.inf)
        z = np.where(inside, z, np.inf).astype(np.float32)
        tile = zbuf[y0 : y1 + 1, x0 : x1 + 1]
        np.minimum(tile, z, out=tile)
    depth = np.where(np.isinf(zbuf), 0.0, zbuf).astype(np.float32)
    return depth


def render_depth_cv(
    verts: np.ndarray, tris: np.ndarray, K: np.ndarray, Rt: np.ndarray,
    rend_size: Tuple[int, int],
) -> np.ndarray:
    """Depth map under a cv-convention camera (renderer.py render_cvcam
    contract): K (3,3), Rt (3,4) world->cam, rend_size (h, w)."""
    h, w = rend_size
    K = np.asarray(K, np.float64)
    Rt = np.asarray(Rt, np.float64)
    cam = verts @ Rt[:3, :3].T + Rt[:3, 3]
    z = cam[:, 2:3]
    uv = cam @ K.T
    with np.errstate(divide="ignore", invalid="ignore"):
        uv = uv[:, :2] / np.maximum(uv[:, 2:3], 1e-12)
    verts_px = np.concatenate([uv, z], axis=-1)
    return rasterize_depth_px(verts_px, tris, h, w)
