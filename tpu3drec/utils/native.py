"""ctypes bindings for the native host library (native/tpu3drec_native.cpp).

Loads `libtpu3drec_native.so` if built (`make -C native`); every entry has
a pure-Python fallback so the native build is an optimization, not a
dependency. The native octree builder handles the reference's 5.4M-point
scale (`ref/octomap/ply_transfer_octomap.py:36-38`) in tens of
milliseconds instead of minutes of per-point C++ tree inserts.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    native_dir = os.path.join(here, "native")
    path = os.path.join(native_dir, "libtpu3drec_native.so")
    if not os.path.exists(path) and os.path.exists(
        os.path.join(native_dir, "Makefile")
    ):
        # one-shot best-effort build; failure just means Python fallbacks
        import subprocess

        subprocess.run(
            ["make", "-C", native_dir], capture_output=True, timeout=120,
            check=False,
        )
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.tpu3drec_bt_write_points.restype = ctypes.c_int64
        lib.tpu3drec_bt_write_points.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_double,
        ]
        lib.tpu3drec_bt_write_keys.restype = ctypes.c_int64
        lib.tpu3drec_bt_write_keys.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_double,
        ]
        # free-leaf variant may be absent in a stale .so (pre-r2 build)
        if hasattr(lib, "tpu3drec_bt_write_keys_free"):
            lib.tpu3drec_bt_write_keys_free.restype = ctypes.c_int64
            lib.tpu3drec_bt_write_keys_free.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.c_double,
            ]
        lib.tpu3drec_ply_write_ascii.restype = ctypes.c_int
        lib.tpu3drec_ply_write_ascii.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_ubyte),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def bt_write_points(path: str, points: np.ndarray, res: float) -> int | None:
    """Native voxelize+dedup+build+write. None if the library is absent."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n = lib.tpu3drec_bt_write_points(
        path.encode(), pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pts.shape[0], float(res),
    )
    if n == -2:
        raise ValueError("voxel keys exceed octomap depth-16 key range")
    if n < 0:
        raise IOError(f"native bt write failed for {path}")
    return int(n)


def bt_write_keys(path: str, keys: np.ndarray, res: float,
                  free_keys: np.ndarray | None = None) -> int | None:
    lib = _load()
    if lib is None:
        return None
    k = np.ascontiguousarray(keys, dtype=np.int32)
    if free_keys is not None:
        if not hasattr(lib, "tpu3drec_bt_write_keys_free"):
            return None  # stale .so without the free-leaf entry point
        fk = np.ascontiguousarray(free_keys, dtype=np.int32)
        n = lib.tpu3drec_bt_write_keys_free(
            path.encode(), k.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            k.shape[0], fk.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            fk.shape[0], float(res),
        )
    else:
        n = lib.tpu3drec_bt_write_keys(
            path.encode(), k.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            k.shape[0], float(res),
        )
    if n == -2:
        raise ValueError("voxel keys exceed octomap depth-16 key range")
    if n < 0:
        raise IOError(f"native bt write failed for {path}")
    return int(n)


def ply_write_ascii(path: str, points: np.ndarray,
                    colors: np.ndarray | None = None) -> bool:
    lib = _load()
    if lib is None:
        return False
    pts = np.ascontiguousarray(points, dtype=np.float32)
    if colors is not None:
        rgb = np.ascontiguousarray(colors, dtype=np.uint8)
        cptr = rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
    else:
        cptr = ctypes.POINTER(ctypes.c_ubyte)()
    rc = lib.tpu3drec_ply_write_ascii(
        path.encode(), pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pts.shape[0], cptr,
    )
    if rc != 0:
        raise IOError(f"native ply write failed for {path}")
    return True
