"""ctypes loader for the native input-pipeline kernels (gather.cpp).

Compiles lazily with g++ on first import (cached as _gather.so next to the
source) and degrades gracefully to numpy when no toolchain is available:
every caller must treat `gather_u8_to_f32 is None` as "use numpy".
"""

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "gather.cpp")
_SO = os.path.join(_DIR, "_gather.so")
_N_THREADS = min(8, os.cpu_count() or 1)

_lib = None
_build_lock = threading.Lock()
logger = logging.getLogger(__name__)


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
           _SRC, "-o", _SO + ".tmp"]
    subprocess.check_call(cmd)
    os.replace(_SO + ".tmp", _SO)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.gather_u8_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_float, ctypes.c_void_p,
                ctypes.c_int]
            lib.gather_u8_f32.restype = None
            lib.gather_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int]
            lib.gather_u8.restype = None
            lib.gather_u8_mul.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
                ctypes.c_int]
            lib.gather_u8_mul.restype = None
            _lib = lib
        except (OSError, subprocess.CalledProcessError) as e:
            logger.warning("native gather unavailable (%s); numpy fallback",
                           e)
            _lib = False
    return _lib


def gather_u8_scaled(imgs, idcs, mul):
    """out[r] = imgs[idcs[r]] * mul as uint8 (callers guarantee no
    overflow). Returns None when the native library is unavailable."""
    lib = _load()
    if not lib:
        return None
    idcs = np.ascontiguousarray(idcs, np.int64)
    row_bytes = int(np.prod(imgs.shape[1:]))
    out = np.empty((len(idcs),) + imgs.shape[1:], np.uint8)
    lib.gather_u8_mul(
        imgs.ctypes.data, row_bytes, idcs.ctypes.data, len(idcs),
        int(mul), out.ctypes.data, _N_THREADS)
    return out


def gather_u8_to_f32(imgs, idcs, scale):
    """out[r] = imgs[idcs[r]].astype(f32) * scale, fused + multithreaded.

    `imgs`: C-contiguous uint8 (N, ...) array or memmap. Returns None if the
    native library is unavailable (caller falls back to numpy)."""
    lib = _load()
    if not lib:
        return None
    idcs = np.ascontiguousarray(idcs, np.int64)
    row_elems = int(np.prod(imgs.shape[1:]))
    out = np.empty((len(idcs),) + imgs.shape[1:], np.float32)
    lib.gather_u8_f32(
        imgs.ctypes.data, row_elems, idcs.ctypes.data, len(idcs),
        ctypes.c_float(scale), out.ctypes.data, _N_THREADS)
    return out
