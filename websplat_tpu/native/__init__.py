"""Native (C++) host components with ctypes bindings.

The reference's host runtime is Rust; the CPU-hot piece is the per-point PLY
decode loop (/root/reference/src/io/ply.rs:50-100,164-196).  This package
builds a small multithreaded C++ decoder on first use (g++ is in the image;
pybind11 is not, so the ABI is plain C via ctypes).  Everything falls back
to the vectorized NumPy path if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ply_native.cpp")
_LIB_PATH = os.path.join(_HERE, "libply_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


class _Layout(ctypes.Structure):
    _fields_ = [
        ("stride_f32", ctypes.c_int64),
        ("off_pos", ctypes.c_int64),
        ("off_dc", ctypes.c_int64),
        ("off_rest", ctypes.c_int64),
        ("off_opacity", ctypes.c_int64),
        ("off_scale", ctypes.c_int64),
        ("off_rot", ctypes.c_int64),
        ("n_coefs", ctypes.c_int64),
        ("big_endian", ctypes.c_int64),
    ]


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH, _SRC,
             "-lpthread"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH
    except Exception as e:  # pragma: no cover - depends on toolchain
        log.warning("native ply decoder build failed (%s); using NumPy path", e)
        return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _LIB_PATH if os.path.exists(_LIB_PATH) else _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.websplat_decode_ply.restype = ctypes.c_int
            lib.websplat_decode_ply.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.POINTER(_Layout),
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_int,
            ]
            _lib = lib
        except OSError as e:  # pragma: no cover
            log.warning("native ply decoder load failed (%s)", e)
        return _lib


def decode_ply_native(
    raw: bytes,
    *,
    stride_f32: int,
    off_pos: int,
    off_dc: int,
    off_rest: int,
    off_opacity: int,
    off_scale: int,
    off_rot: int,
    n_coefs: int,
    big_endian: bool,
    n_points: int,
    n_threads: int = 0,
):
    """-> (xyz f32 (N,3), opacity f16 (N,), cov f16 (N,6), sh f16 (N,16,3))
    or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    xyz = np.empty((n_points, 3), np.float32)
    opacity = np.empty((n_points,), np.uint16)
    cov = np.empty((n_points, 6), np.uint16)
    sh = np.empty((n_points, 16, 3), np.uint16)
    layout = _Layout(
        stride_f32, off_pos, off_dc, off_rest, off_opacity, off_scale, off_rot,
        n_coefs, int(big_endian),
    )
    buf = np.frombuffer(raw, dtype=np.uint8, count=n_points * stride_f32 * 4)
    rc = lib.websplat_decode_ply(
        buf.ctypes.data_as(ctypes.c_void_p),
        n_points,
        ctypes.byref(layout),
        xyz.ctypes.data_as(ctypes.c_void_p),
        opacity.ctypes.data_as(ctypes.c_void_p),
        cov.ctypes.data_as(ctypes.c_void_p),
        sh.ctypes.data_as(ctypes.c_void_p),
        n_threads,
    )
    if rc != 0:
        return None
    return (
        xyz,
        opacity.view(np.float16),
        cov.view(np.float16),
        sh.view(np.float16),
    )
