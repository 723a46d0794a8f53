"""ctypes binding for the native data plane (libdlxdata.so).

Builds the shared library on first use if missing (g++ + system libjpeg).
Python-side fallback (PIL) lives in ``data/imagenet.py`` for environments
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["DataPlane", "available"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libdlxdata.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    subprocess.run(
        ["make", "-C", _DIR, "libdlxdata.so"], check=True, capture_output=True
    )


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.dlx_jpeg_info.restype = ctypes.c_int
        lib.dlx_jpeg_info.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.dlx_decode_rrc.restype = ctypes.c_int
        lib.dlx_pool_create.restype = ctypes.c_void_p
        lib.dlx_pool_create.argtypes = [ctypes.c_int]
        lib.dlx_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.dlx_pool_decode_batch.restype = ctypes.c_int
        lib.dlx_pool_decode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class DataPlane:
    """Batch JPEG decode + RRC + normalize on a native thread pool."""

    def __init__(self, n_threads: int | None = None):
        self.lib = _load()
        n = n_threads or max(os.cpu_count() or 1, 1)
        self.pool = self.lib.dlx_pool_create(n)

    def __del__(self):
        if getattr(self, "pool", None):
            self.lib.dlx_pool_destroy(self.pool)
            self.pool = None

    def jpeg_info(self, data: bytes) -> tuple[int, int]:
        w, h = ctypes.c_int(), ctypes.c_int()
        rc = self.lib.dlx_jpeg_info(data, len(data), ctypes.byref(w), ctypes.byref(h))
        if rc != 0:
            raise ValueError("not a decodable JPEG")
        return w.value, h.value

    def decode_batch(
        self,
        jpegs: list[bytes],
        crops: np.ndarray,  # (N, 4) float32 fractions x,y,w,h
        flips: np.ndarray,  # (N,) int32
        out_size: int,
        mean=(0.485, 0.456, 0.406),
        std=(0.229, 0.224, 0.225),
    ) -> np.ndarray:
        n = len(jpegs)
        out = np.empty((n, out_size, out_size, 3), np.float32)
        data_ptrs = (ctypes.c_char_p * n)(*jpegs)
        lens = (ctypes.c_size_t * n)(*[len(j) for j in jpegs])
        crops = np.ascontiguousarray(crops, np.float32)
        flips = np.ascontiguousarray(flips, np.int32)
        mean_arr = np.asarray(mean, np.float32)
        std_arr = np.asarray(std, np.float32)
        failures = self.lib.dlx_pool_decode_batch(
            self.pool, n,
            ctypes.cast(data_ptrs, ctypes.POINTER(ctypes.c_char_p)),
            lens,
            crops.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            flips.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_size,
            mean_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            std_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if failures:
            import warnings

            warnings.warn(f"{failures} images failed to decode (zero-filled)")
        return out
