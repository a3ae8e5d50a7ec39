"""ctypes binding to the native C++ batch image loader (native/loader.cpp).

The native loader decodes + resizes + VGG-preprocesses a batch of images with
a pthread pool, writing straight into a caller-provided float32 buffer; it
removes the PIL-per-image Python hot loop from the input pipeline. Falls back
gracefully (``available() == False``) when the shared library has not been
built; build it with ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "native", "libimgloader.so"),
        os.path.join(os.path.dirname(__file__), "libimgloader.so"),
    ):
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.load_batch_vgg.restype = ctypes.c_int
                lib.load_batch_vgg.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p),
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int,
                ]
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def available() -> bool:
    return _lib() is not None


def load_batch_vgg(paths: list[str], num_threads: int = 8) -> np.ndarray:
    """Decode+resize+VGG-preprocess a batch -> (B,224,224,3) float32 BGR."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native loader not built (make -C native)")
    n = len(paths)
    out = np.empty((n, 224, 224, 3), dtype=np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.load_batch_vgg(arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads)
    if rc != 0:
        raise RuntimeError(f"native loader failed on {rc-1}-th image: {paths[rc-1]}")
    return out
