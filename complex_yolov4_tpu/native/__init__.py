"""ctypes bindings for the native BEV rasterizer (libbev_native.so).

Auto-builds with `make` on first import when a compiler is available;
`is_available()` gates every use so the pure-numpy path in `data.bev` is
always a valid fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libbev_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.cyv4_rasterize_points.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float)]
    lib.cyv4_rasterize_file.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float)]
    lib.cyv4_rasterize_file.restype = ctypes.c_int64
    lib.cyv4_rasterize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32]
    lib.cyv4_rasterize_batch.restype = ctypes.c_int32
    lib.cyv4_aggregate_cells.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.cyv4_aggregate_cells.restype = ctypes.c_int64
    lib.cyv4_mosaic.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


def rasterize_points(points: np.ndarray) -> np.ndarray:
    """(N, 4) float32 raw (uncropped) points -> (608, 608, 3) float32 BEV.

    Crop + z-shift happen inside; equivalent to
    `bev.make_bev_map(bev.remove_points_outside(points))`.
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty((608, 608, 3), np.float32)
    lib.cyv4_rasterize_points(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(pts.shape[0]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def aggregate_cells(points: np.ndarray):
    """(N, 4) float32 raw (uncropped) points -> (cells (M,) int32,
    keys (M,) int32) COO for `bev.make_bev_map_from_cells`. Bit-identical to
    `bev.aggregate_bev_cells(bev.remove_points_outside(points))`."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    pts = np.ascontiguousarray(points, np.float32)
    cap = min(pts.shape[0], 609 * 609)
    cells = np.empty((cap,), np.int32)
    keys = np.empty((cap,), np.int32)
    m = lib.cyv4_aggregate_cells(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(pts.shape[0]),
        cells.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return cells[:m].copy(), keys[:m].copy()


def mosaic_rasterize(points_list: List[np.ndarray], flips: List[bool],
                     holes_list: List[List[tuple]], yc: int,
                     xc: int) -> np.ndarray:
    """Fused 4-frame mosaic: rasterize + flip/cutout + placement + 2:1 resize
    in one C++ pass (matches dataset.load_mosaic followed by the loader's
    cv2.INTER_LINEAR downsample; see bev_native.cpp::mosaic).

    points_list: 4 (n_q, 4) float32 post-augmentation point arrays.
    holes_list: per-frame cutout rows (y1, y2, x1, x2, fill) in sub-image
    coords (after flip). Returns the final (608, 608, 3) float32 canvas.
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    assert len(points_list) == 4 and len(flips) == 4 and len(holes_list) == 4
    pts = np.concatenate(
        [np.ascontiguousarray(p, np.float32).reshape(-1, 4)
         for p in points_list], axis=0)
    npts = np.array([p.shape[0] for p in points_list], np.int64)
    flips_arr = np.array([1 if f else 0 for f in flips], np.uint8)
    hole_counts = np.array([len(h) for h in holes_list], np.int32)
    all_holes = [row for h in holes_list for row in h]
    holes = (np.array(all_holes, np.float32).reshape(-1, 5)
             if all_holes else np.zeros((0, 5), np.float32))
    out = np.empty((608, 608, 3), np.float32)
    lib.cyv4_mosaic(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        npts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        flips_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        holes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hole_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(int(yc)), ctypes.c_int32(int(xc)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def rasterize_files(paths: List[str], num_threads: int = 0) -> np.ndarray:
    """Batch of velodyne .bin paths -> (B, 608, 608, 3), threaded in C++."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    b = len(paths)
    out = np.empty((b, 608, 608, 3), np.float32)
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    failures = lib.cyv4_rasterize_batch(
        arr, ctypes.c_int32(b),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int32(num_threads))
    if failures:
        raise IOError(f"{failures} of {b} velodyne files failed to load")
    return out
