"""ctypes bridge to the native C++ decode pool (native/decoder.cpp).

Compiles the shared library on first use (g++ + libjpeg, cached next to
the source) and exposes :class:`NativeImageLoader` with the same
``load_batch`` surface as the PIL-based
:class:`deep_insight_face_tpu.data.dataset.ImageLoader`. Falls back
cleanly when the toolchain or libjpeg is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "decoder.cpp"))
_LIB = os.path.abspath(os.path.join(_NATIVE_DIR, "libdif_decoder.so"))

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the shared library; returns an error string or None."""
    if not os.path.exists(_SRC):
        return f"native source missing: {_SRC}"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-ljpeg", "-lpthread", "-o", _LIB,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"g++ invocation failed: {e}"
    if proc.returncode != 0:
        return f"g++ failed: {proc.stderr[-500:]}"
    return None


def get_native_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the decoder library; None if unavailable."""
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build_error = _build()
            if _build_error is not None:
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.dif_decode_batch.restype = ctypes.c_int
        lib.dif_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.dif_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_native_lib() is not None


class NativeImageLoader:
    """Batch JPEG decode + resize through the C++ thread pool.

    Non-JPEG files (or corrupt images) fall back to PIL per-file, so the
    loader accepts the same mixed inputs as the pure-Python one.
    """

    def __init__(self, num_threads: int = 8, image_size: int = 112):
        if image_size is None:
            raise ValueError("NativeImageLoader requires a fixed image_size")
        self.num_threads = num_threads
        self.image_size = image_size
        self._lib = get_native_lib()
        if self._lib is None:
            raise RuntimeError(f"native decoder unavailable: {_build_error}")

    def load_batch(self, paths: Sequence[str]) -> np.ndarray:
        n = len(paths)
        s = self.image_size
        out = np.zeros((n, s, s, 3), np.uint8)
        statuses = (ctypes.c_int * n)()
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        self._lib.dif_decode_batch(
            arr, n, s,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            statuses, self.num_threads,
        )
        # PIL fallback for non-JPEG / failed slots
        for i in range(n):
            if statuses[i] == 0:
                from deep_insight_face_tpu.data.dataset import load_image

                out[i] = load_image(paths[i], image_size=s)
        return out

    def close(self) -> None:  # pool is process-global; nothing to do
        pass


def make_image_loader(num_threads: int = 8, image_size: Optional[int] = None):
    """Best loader available: native C++ pool when the toolchain+libjpeg
    exist and a fixed size is requested, else the PIL thread pool."""
    if image_size is not None and native_available():
        try:
            return NativeImageLoader(num_threads, image_size)
        except RuntimeError:
            pass
    from deep_insight_face_tpu.data.dataset import ImageLoader

    return ImageLoader(num_threads=num_threads, image_size=image_size)
