"""Native runtime components (C++ via ctypes, NumPy fallback).

Builds `libploloader.so` on first use with g++ -O3 (toolchain baked into the
image; no pip deps). If the toolchain is unavailable the pure-NumPy fallback
keeps everything working.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "loader.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libploloader.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 _SRC, "-o", _LIB],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.plo_load_bin.restype = ctypes.c_int64
        lib.plo_load_bin.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.plo_prefetcher_create.restype = ctypes.c_void_p
        lib.plo_prefetcher_create.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64]
        lib.plo_prefetcher_next.restype = ctypes.c_int64
        lib.plo_prefetcher_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        lib.plo_prefetcher_destroy.restype = None
        lib.plo_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        lib.plo_quantize_pack.restype = ctypes.c_int64
        lib.plo_quantize_pack.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.POINTER(ctypes.c_int16), ctypes.c_int64]
        lib.plo_rasterize_grid16.restype = ctypes.c_int64
        lib.plo_rasterize_grid16.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.POINTER(ctypes.c_uint16)]
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def available() -> bool:
    return _ensure_built() is not None


def quantize_pack(raw: np.ndarray, inv_scale: float, out: np.ndarray) -> Optional[int]:
    """Quantize one scan's xyz into a preallocated int16 [capacity, 3] row
    (5 mm fixed-point host->device transfer format). Returns the point count,
    or None if the native library is unavailable or the input layout doesn't
    qualify (caller falls back to NumPy)."""
    lib = _ensure_built()
    if (lib is None or raw.dtype != np.float32 or raw.ndim != 2
            or raw.shape[1] < 3 or not raw.flags.c_contiguous
            or out.dtype != np.int16 or not out.flags.c_contiguous):
        return None
    return int(lib.plo_quantize_pack(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        raw.shape[0], raw.shape[1], ctypes.c_float(inv_scale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), out.shape[0]))


def rasterize_grid16(raw: np.ndarray, n_scans: int, width: int,
                     inv_scale: float, min_range: float, max_range: float,
                     out: np.ndarray) -> Optional[int]:
    """Rasterize one raw scan [n, >=3] f32 into a [n_scans, width] uint16
    range grid (grid16 transfer format: 0 = empty, else quantized 3D range,
    min wins per cell; rings via the Velodyne formulas, columns via the
    azimuth fraction). Returns the occupied-cell count, or None when the
    native library is unavailable / layout doesn't qualify (caller falls
    back to NumPy)."""
    lib = _ensure_built()
    if (lib is None or raw.dtype != np.float32 or raw.ndim != 2
            or raw.shape[1] < 3 or not raw.flags.c_contiguous
            or out.dtype != np.uint16 or not out.flags.c_contiguous
            or out.shape != (n_scans, width)):
        return None
    return int(lib.plo_rasterize_grid16(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        raw.shape[0], raw.shape[1], n_scans, width,
        ctypes.c_float(inv_scale), ctypes.c_float(min_range),
        ctypes.c_float(max_range),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))))


def rasterize_grid16_numpy(raw: np.ndarray, n_scans: int, width: int,
                           inv_scale: float, min_range: float,
                           max_range: float, out: np.ndarray) -> int:
    """NumPy fallback for rasterize_grid16 (same semantics)."""
    xyz = raw[:, :3].astype(np.float64)
    finite = np.isfinite(xyz).all(axis=1)
    r2d = np.hypot(xyz[:, 0], xyz[:, 1])
    r3d = np.sqrt(r2d * r2d + xyz[:, 2] ** 2)
    ok = finite & (r3d >= min_range) & (r3d <= max_range)
    ang = np.degrees(np.arctan2(xyz[:, 2], np.maximum(r2d, 1e-12)))
    if n_scans == 16:
        ring = np.floor((ang + 15.0) / 2.0 + 0.5).astype(np.int64)
        ok &= (ring >= 0) & (ring < 16)
    elif n_scans == 32:
        from plo_tpu.ops.preprocess import VLP32C_ANGLES
        tbl = np.asarray(VLP32C_ANGLES)
        ring = np.abs(ang[:, None] - tbl[None, :]).argmin(axis=1).astype(np.int64)
    else:
        ok &= (ang <= 2.0) & (ang >= -24.33)
        rhi = np.floor((2.0 - ang) * 3.0 + 0.5).astype(np.int64)
        rlo = 32 + np.floor((-8.83 - ang) * 2.0 + 0.5).astype(np.int64)
        ring = np.where(ang >= -8.83, rhi, rlo)
        ok &= (ring >= 0) & (ring <= 50)
    frac = (-np.arctan2(xyz[:, 1], xyz[:, 0])) / (2 * np.pi)
    frac -= np.floor(frac)
    col = (np.rint(frac * width).astype(np.int64)) % width
    q = np.minimum(np.rint(r3d * inv_scale), 65535).astype(np.uint16)
    q = np.maximum(q, 1)
    out[:] = 0
    cell = ring[ok] * width + col[ok]
    flat = out.reshape(-1)
    order = np.argsort(q[ok], kind="stable")[::-1]  # min wins: write desc
    flat[cell[order]] = q[ok][order]
    return int((flat > 0).sum())


def load_bin_padded(path: str, capacity: int) -> tuple[np.ndarray, int]:
    """Load one KITTI .bin into a zero-padded [capacity, 4] float32 array.
    Returns (array, n_points)."""
    lib = _ensure_built()
    out = np.zeros((capacity, 4), np.float32)
    if lib is not None:
        n = lib.plo_load_bin(path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                             capacity)
        if n >= 0:
            return out, int(n)
    data = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    n = min(len(data), capacity)
    out[:n] = data[:n]
    return out, n


class ScanPrefetcher:
    """Double-buffered background scan loader: the next scan is read + padded
    on a native thread while the current one is on-device."""

    def __init__(self, paths: List[str], capacity: int):
        self.paths = list(paths)
        self.capacity = capacity
        self._i = 0
        lib = _ensure_built()
        self._lib = lib
        self._handle = None
        if lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(*[p.encode() for p in self.paths])
            self._keepalive = arr
            self._handle = lib.plo_prefetcher_create(arr, len(self.paths), capacity)

    def __iter__(self):
        return self

    def __next__(self):
        if self._handle is not None:
            out = np.zeros((self.capacity, 4), np.float32)
            n = self._lib.plo_prefetcher_next(
                self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if n == -2:
                raise StopIteration
            return out, int(n)
        if self._i >= len(self.paths):
            raise StopIteration
        out, n = load_bin_padded(self.paths[self._i], self.capacity)
        self._i += 1
        return out, n

    def close(self):
        if self._handle is not None:
            self._lib.plo_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
