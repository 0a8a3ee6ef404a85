"""Clipmap mesh builder: native C++ backend (ctypes) with a NumPy twin.

Replaces the reference's pre-baked clipmap OBJ assets (C19: clipmap_high/low,
512x512 m graded plane) with a procedural generator: native/clipmap.cpp built
on demand, plus `build_clipmap_numpy` as the portable twin and test oracle.
Also carries the camera-follow tile-snap helper (main.gd:32-37).
"""
from __future__ import annotations

import ctypes
import functools
import pathlib
import subprocess
import tempfile

import numpy as np

_NATIVE_SRC = pathlib.Path(__file__).resolve().parents[2] / "native" / "clipmap.cpp"


@functools.lru_cache(maxsize=1)
def _load_native():
    """Compile (cached per build dir) and load the native library; None on failure."""
    try:
        build_dir = pathlib.Path(tempfile.gettempdir()) / "godotoceanwaves_native"
        build_dir.mkdir(exist_ok=True)
        so = build_dir / "libclipmap.so"
        if not so.exists() or so.stat().st_mtime < _NATIVE_SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", str(_NATIVE_SRC), "-o", str(so)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(so))
        lib.clipmap_counts.restype = ctypes.c_int
        lib.clipmap_counts.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                       ctypes.POINTER(ctypes.c_int32),
                                       ctypes.POINTER(ctypes.c_int32)]
        lib.clipmap_build.restype = ctypes.c_int
        lib.clipmap_build.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_float,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.POINTER(ctypes.c_uint32)]
        return lib
    except Exception:
        return None


def _axis_coords(levels: int, center_res: int, ring_cells: int, extent: float):
    span_units = center_res * 0.5
    scale = 1.0
    for _ in range(levels):
        scale *= 2.0
        span_units += ring_cells * scale
    step0 = (extent * 0.5) / span_units

    pos = []
    x, s = 0.0, step0
    for _ in range(center_res // 2):
        x += s
        pos.append(x)
    for _ in range(levels):
        s *= 2.0
        for _ in range(ring_cells):
            x += s
            pos.append(x)
    return np.asarray([-v for v in pos[::-1]] + [0.0] + pos)


def build_clipmap_numpy(levels: int = 4, center_res: int = 64,
                        ring_cells: int = 16, extent: float = 512.0):
    """Portable twin of the native generator: (verts (V, 2) f32, idx (T, 3) u32)."""
    coords = _axis_coords(levels, center_res, ring_cells, extent)
    k = len(coords)
    xx, zz = np.meshgrid(coords, coords)
    verts = np.stack([xx.ravel(), zz.ravel()], -1).astype(np.float32)
    j, i = np.meshgrid(np.arange(k - 1), np.arange(k - 1), indexing="ij")
    a = (j * k + i).ravel()
    b = a + 1
    c = a + k
    d = c + 1
    idx = np.stack([np.stack([a, c, b], -1), np.stack([b, c, d], -1)], 1)
    return verts, idx.reshape(-1, 3).astype(np.uint32)


def build_clipmap(levels: int = 4, center_res: int = 64, ring_cells: int = 16,
                  extent: float = 512.0, prefer_native: bool = True):
    """Graded clipmap plane (the reference's 512 m mesh, water.gd:8-9).

    Returns (verts (V, 2) float32 xz, indices (T, 3) uint32). Uses the C++
    generator when the toolchain is available, else the NumPy twin.
    """
    lib = _load_native() if prefer_native else None
    if lib is None:
        return build_clipmap_numpy(levels, center_res, ring_cells, extent)
    nv = ctypes.c_int32()
    ni = ctypes.c_int32()
    if lib.clipmap_counts(levels, center_res, ring_cells,
                          ctypes.byref(nv), ctypes.byref(ni)):
        raise ValueError("invalid clipmap parameters")
    verts = np.empty((nv.value, 2), np.float32)
    idx = np.empty(ni.value, np.uint32)
    rc = lib.clipmap_build(
        levels, center_res, ring_cells, extent,
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    if rc:
        raise ValueError("clipmap_build failed")
    return verts, idx.reshape(-1, 3)


def snap_to_tile(camera_xz, tile_size: float = 1.0):
    """Clipmap-follow: snap the mesh origin to the camera's tile (main.gd:32-37)."""
    camera_xz = np.asarray(camera_xz, np.float64)
    return np.ceil(camera_xz / tile_size) * tile_size
