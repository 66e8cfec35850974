"""ctypes bindings for the native (C++) frame loader.

``native/png_loader.cpp`` decodes PNGs to float32 grayscale outside the GIL and
batch-decodes a prefetch window with a thread pool (the native half of the ingest
pipeline, SURVEY §2.2 N10 — the reference's equivalent surface is OpenCV's C++
``cv2.imread``, ``src/main.py:216-226``). Falls back to PIL per-file when the
shared library isn't built or a file uses an unsupported PNG feature.

Build: ``make -C native`` (auto-attempted once on first import).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "liblcvo_native.so",
)
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:  # build once, quietly; missing toolchain -> PIL fallback
            subprocess.run(
                ["make", "-C", os.path.dirname(_LIB_PATH)],
                capture_output=True,
                timeout=120,
                check=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.lcvo_png_shape.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.lcvo_decode_png.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.lcvo_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    # u8 variants (older prebuilt .so may lack them — probe, don't assume)
    if hasattr(lib, "lcvo_decode_png_u8"):
        lib.lcvo_decode_png_u8.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.lcvo_decode_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def png_shape(path: str) -> tuple[int, int] | None:
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.lcvo_png_shape(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def decode_png(path: str, dtype=np.float32) -> np.ndarray | None:
    """(H, W) grayscale in ``dtype`` (float32 or uint8), or None when the native
    path can't handle it. uint8 is the H2D-lean ingest path — the tunnel
    transfer is 4x smaller and the pipeline casts to f32 on device."""
    lib = _load()
    if lib is None:
        return None
    shape = png_shape(path)
    if shape is None:
        return None
    if dtype == np.uint8:
        if not hasattr(lib, "lcvo_decode_png_u8"):
            return None
        out = np.empty(shape, np.uint8)
        rc = lib.lcvo_decode_png_u8(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), *shape
        )
    else:
        out = np.empty(shape, np.float32)
        rc = lib.lcvo_decode_png(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), *shape
        )
    return out if rc == 0 else None


def decode_batch(paths: list[str], h: int, w: int, n_threads: int = 4) -> np.ndarray | None:
    """(N, h, w) float32 batch decode with the C++ thread pool.

    Returns None if the library is unavailable or ANY file fails (caller falls
    back per-file)."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, h, w), np.float32)
    rcs = (ctypes.c_int * n)()
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.lcvo_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, n_threads, rcs
    )
    return out if rc == 0 else None
