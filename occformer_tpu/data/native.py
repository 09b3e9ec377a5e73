"""ctypes bindings for the native data kernels (csrc/occ_data.cpp).

Compiled on demand with g++ (cached beside the package); every function
falls back to the numpy implementation when the library is unavailable, so
the framework stays importable in minimal environments.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "libocc_data.so")


def build_native(force: bool = False) -> Optional[str]:
    """Compile csrc/occ_data.cpp -> data/libocc_data.so (idempotent)."""
    src = os.path.join(_repo_root(), "csrc", "occ_data.cpp")
    out = _lib_path()
    if not os.path.exists(src):
        return None
    if (not force) and os.path.exists(out) and (
        os.path.getmtime(out) >= os.path.getmtime(src)
    ):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", out],
            check=True, capture_output=True, timeout=120,
        )
        return out
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LIB_LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = build_native()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.majority_vote.argtypes = [i64p, i64p, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_int32, i64p]
        lib.zbuffer_depth.argtypes = [i32p, i32p, f32p, u8p, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_int64, f32p]
        lib.unpack_bits.argtypes = [u8p, ctypes.c_int64, u8p]
        lib.pack_bits.argtypes = [u8p, ctypes.c_int64, u8p]
        _LIB = lib
        return _LIB


def majority_vote_native(flat_idx: np.ndarray, labels: np.ndarray,
                         n_voxels: int, empty_id: int,
                         suppress_zero: bool = False) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.full(n_voxels, empty_id, np.int64)
    lib.majority_vote(
        np.ascontiguousarray(flat_idx, np.int64),
        np.ascontiguousarray(labels, np.int64),
        len(flat_idx), n_voxels, int(suppress_zero), out,
    )
    return out


def zbuffer_depth_native(u: np.ndarray, v: np.ndarray, d: np.ndarray,
                         valid: np.ndarray, h: int, w: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    depth = np.zeros(h * w, np.float32)
    lib.zbuffer_depth(
        np.ascontiguousarray(u, np.int32), np.ascontiguousarray(v, np.int32),
        np.ascontiguousarray(d, np.float32),
        np.ascontiguousarray(valid, np.uint8), len(u), h, w, depth,
    )
    return depth.reshape(h, w)


def unpack_bits_native(data: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(len(data) * 8, np.uint8)
    lib.unpack_bits(np.ascontiguousarray(data, np.uint8), len(data), out)
    return out
