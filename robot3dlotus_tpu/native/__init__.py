"""Native (C++) host-side kernels, built on first use with the system g++.

The reference's host preprocessing leans on open3d's C++ voxelizer
(utils/point_cloud.py:8-17); this package provides the equivalent as a tiny
ctypes extension compiled from native/voxelize.cpp. Anything here must have
a pure-numpy fallback — `get_lib()` returns None when no compiler is
available and callers silently fall back.

Set ROBOT3DLOTUS_NATIVE=0 to disable native kernels entirely.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile

import numpy as np

LOGGER = logging.getLogger("robot3dlotus_tpu.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "voxelize.cpp")
_LIB = None
_TRIED = False


def _build(so_path):
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           _SRC, "-o", so_path]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        # surface the compiler diagnostics: a bare CalledProcessError gives
        # the operator nothing to act on
        raise RuntimeError(
            f"g++ failed (rc={proc.returncode}) for {' '.join(cmd)}:\n"
            f"{proc.stderr[-2000:]}")


def _cpu_tag():
    """Short tag of this host's ISA: the .so is built -march=native, so a
    cache hit from a different CPU (shared filesystem across heterogeneous
    nodes) would load fine and then SIGILL at first call — something the
    numpy-fallback try/except cannot catch. Tagging the filename makes each
    host type build its own."""
    import hashlib
    import platform
    txt = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    txt += line
                    break
    except OSError:
        pass
    return hashlib.md5(txt.encode()).hexdigest()[:8]


def get_lib():
    """Returns the loaded ctypes library, building it if needed; None when
    disabled or unbuildable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("ROBOT3DLOTUS_NATIVE", "1") == "0":
        return None
    so_path = os.path.join(_HERE, f"_voxelize-{_cpu_tag()}.so")
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
            # build into a temp file then atomically rename so concurrent
            # workers never load a half-written .so
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
            os.close(fd)
            _build(tmp)
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.voxelize_trace.restype = ctypes.c_long
        lib.voxelize_trace.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_longlong)]
        lib.crop_voxelize_trace.restype = ctypes.c_long
        lib.crop_voxelize_trace.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_ubyte)]
        lib.neighbor_map_dense.restype = ctypes.c_long
        lib.neighbor_map_dense.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_long, ctypes.c_long, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_long, ctypes.c_long, ctypes.POINTER(ctypes.c_int16)]
        _LIB = lib
    except Exception:
        LOGGER.warning("native voxelizer unavailable; using numpy fallback",
                       exc_info=True)
        _LIB = None
    return _LIB


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def voxelize_trace_native(xyz, voxel_size):
    """C++ voxel downsample with trace. Returns (means (M,3) float32,
    first (M,) int64) in the same voxel order as ops.voxel.voxelize_pcd_np,
    or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, np.float32)
    n = len(xyz)
    if n == 0:
        return xyz, np.zeros(0, np.int64)
    means = np.empty((n, 3), np.float32)
    first = np.empty(n, np.int64)
    m = lib.voxelize_trace(
        _fptr(xyz), n, ctypes.c_float(voxel_size), _fptr(means),
        first.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)))
    if m < 0:  # grid exceeded 21 bits/axis — caller falls back
        return None
    return means[:m].copy(), first[:m].copy()


def neighbor_map_dense_native(grid, counts, offs, extent):
    """C++ stencil neighbor map (train/datasets/structure.py host path).
    grid (B, N, 3) int32 in [0, extent); counts (B,) int32; offs (K, 3)
    int32. Returns (B, N, K) int16 with -1 = missing, or None when the
    native library is unavailable or the inputs exceed its contract
    (caller falls back to ops.sparse_conv.build_neighbor_map_np)."""
    lib = get_lib()
    if lib is None:
        return None
    grid = np.ascontiguousarray(grid, np.int32)
    counts = np.ascontiguousarray(counts, np.int32)
    offs = np.ascontiguousarray(offs, np.int32)
    B, N, _ = grid.shape
    K = offs.shape[0]
    out = np.empty((B, N, K), np.int16)
    iptr = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    rc = lib.neighbor_map_dense(
        iptr(grid, ctypes.c_int32), iptr(counts, ctypes.c_int32),
        B, N, iptr(offs, ctypes.c_int32), K, int(extent),
        iptr(out, ctypes.c_int16))
    if rc < 0:
        return None
    return out


def crop_voxelize_trace_native(xyz, voxel_size, workspace, rm_table=True):
    """Fused workspace crop + voxelize (eval_simple_policy.py:156-176 head).
    Returns (means, first_original_idx, keep_mask) or None."""
    lib = get_lib()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, np.float32)
    n = len(xyz)
    bbox = np.asarray([
        workspace["X_BBOX"][0], workspace["X_BBOX"][1],
        workspace["Y_BBOX"][0], workspace["Y_BBOX"][1],
        workspace["Z_BBOX"][0], workspace["Z_BBOX"][1],
        workspace["TABLE_HEIGHT"]], np.float32)
    means = np.empty((max(n, 1), 3), np.float32)
    first = np.empty(max(n, 1), np.int64)
    keep = np.empty(max(n, 1), np.uint8)
    m = lib.crop_voxelize_trace(
        _fptr(xyz), n, ctypes.c_float(voxel_size), _fptr(bbox),
        int(bool(rm_table)), _fptr(means),
        first.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if m < 0:
        return None
    return (means[:m].copy(), first[:m].copy(),
            keep[:n].astype(bool))
