"""ctypes bindings for the native COLMAP serialization helper.

Loads native/libcolmap_io.so (built by native/build.sh) and exposes the
batch points3D/observation packers; `vggsfm_tpu.io.colmap` uses them
automatically when available and falls back to pure Python otherwise, so
the native library is an optimization, never a requirement.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cand = os.path.join(here, "native", "libcolmap_io.so")
    return cand if os.path.exists(cand) else None


def load_library():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i64 = ctypes.c_int64
    u64 = ctypes.c_uint64
    p = ctypes.c_void_p
    lib.colmap_pack_observations.restype = i64
    lib.colmap_pack_observations.argtypes = [p, p, i64, p]
    lib.colmap_pack_points3d_batch.restype = i64
    lib.colmap_pack_points3d_batch.argtypes = [p, p, p, p, p, p, p, i64, p]
    lib.colmap_unpack_observations.restype = i64
    lib.colmap_unpack_observations.argtypes = [p, p, p, i64]
    _LIB = lib
    return lib


def available() -> bool:
    return load_library() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def pack_observations(xy: np.ndarray, ids: np.ndarray) -> bytes:
    """(n,2) f64 + (n,) i64 -> images.bin observation block bytes."""
    lib = load_library()
    xy = np.ascontiguousarray(xy, np.float64)
    ids = np.ascontiguousarray(ids, np.int64)
    n = len(ids)
    out = np.empty(8 + 24 * n, np.uint8)
    written = lib.colmap_pack_observations(_ptr(xy), _ptr(ids), n, _ptr(out))
    return out[:written].tobytes()


def pack_points3d(ids, xyz, rgb, errors, track_offsets, track_image_ids,
                  track_p2d_idxs) -> bytes:
    """CSR-packed points3D records -> points3D.bin body bytes."""
    lib = load_library()
    ids = np.ascontiguousarray(ids, np.uint64)
    xyz = np.ascontiguousarray(xyz, np.float64)
    rgb = np.ascontiguousarray(rgb, np.uint8)
    errors = np.ascontiguousarray(errors, np.float64)
    track_offsets = np.ascontiguousarray(track_offsets, np.int64)
    tii = np.ascontiguousarray(track_image_ids, np.int32)
    tpi = np.ascontiguousarray(track_p2d_idxs, np.int32)
    P = len(ids)
    total_obs = int(track_offsets[-1])
    out = np.empty(P * 51 + total_obs * 8, np.uint8)
    written = lib.colmap_pack_points3d_batch(
        _ptr(ids), _ptr(xyz), _ptr(rgb), _ptr(errors), _ptr(track_offsets),
        _ptr(tii), _ptr(tpi), P, _ptr(out))
    return out[:written].tobytes()
