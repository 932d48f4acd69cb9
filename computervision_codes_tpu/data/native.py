"""ctypes bindings for the native host data plane (native/dataplane.cpp).

Gives the input pipeline a GIL-free, multithreaded decode+resize+normalize
path. Falls back to the PIL path transparently when the shared library has
not been built (``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from .transforms import IMAGENET_MEAN, IMAGENET_STD

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "libdataplane.so")
_lib = None


def load_library(path: Optional[str] = None):
    global _lib
    if _lib is not None:
        return _lib
    p = path or os.environ.get("CVC_DATAPLANE_LIB", _LIB_PATH)
    try:
        lib = ctypes.CDLL(os.path.abspath(p))
    except OSError:
        return None
    lib.dp_decode_one.restype = ctypes.c_int
    lib.dp_decode_one.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    lib.dp_decode_batch.restype = ctypes.c_int
    lib.dp_decode_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    if hasattr(lib, "dp_decode_batch_u8"):  # v2 of the library
        lib.dp_decode_batch_u8.restype = ctypes.c_int
        lib.dp_decode_batch_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def enabled() -> bool:
    """Use the native plane by default whenever built: since round 3 the
    fixed-point resize + jpeg decode-at-scale beat PIL single-threaded on
    both formats (PNG 1.4x, JPEG 1.9x at the 854x480->256x448 reference
    geometry — scripts/hostplane_bench.py, docs/BENCH.md), on top of the
    GIL-free thread scaling. CVC_NATIVE_DECODE=1/0 overrides.
    """
    flag = os.environ.get("CVC_NATIVE_DECODE")
    if flag is not None:
        return flag == "1" and available()
    return available()


def _cfloats(arr) -> "ctypes.POINTER(ctypes.c_float)":
    return np.ascontiguousarray(arr, np.float32).ctypes.data_as(
        ctypes.POINTER(ctypes.c_float))


def decode_batch(paths: Sequence[str], size: Tuple[int, int],
                 mean=IMAGENET_MEAN, std=IMAGENET_STD,
                 n_threads: Optional[int] = None) -> np.ndarray:
    """Decode+resize+normalize a batch of files -> (N, H, W, 3) float32."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native data plane not built; run native/build.sh")
    h, w = size
    n = len(paths)
    out = np.empty((n, h, w, 3), np.float32)
    mean_a = np.ascontiguousarray(mean, np.float32)
    std_a = np.ascontiguousarray(std, np.float32)
    joined = "\n".join(paths).encode()
    threads = n_threads or min(os.cpu_count() or 1, 16)
    failed = lib.dp_decode_batch(
        joined, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, _cfloats(mean_a), _cfloats(std_a), threads)
    if failed:
        raise IOError(f"native decode failed for {failed}/{n} files")
    return out


def decode_batch_u8(paths: Sequence[str], size: Tuple[int, int],
                    n_threads: Optional[int] = None) -> np.ndarray:
    """Decode+resize WITHOUT normalization -> (N, H, W, 3) uint8.

    The serving path normalizes uint8 frames on device (serving.py), so
    the host skips the float conversion — 3x less output memory traffic
    and the fastest feed path (scripts/hostplane_bench.py)."""
    lib = load_library()
    if lib is None or not hasattr(lib, "dp_decode_batch_u8"):
        raise RuntimeError("native data plane v2 not built; run "
                           "native/build.sh")
    h, w = size
    n = len(paths)
    out = np.empty((n, h, w, 3), np.uint8)
    joined = "\n".join(paths).encode()
    threads = n_threads or min(os.cpu_count() or 1, 16)
    failed = lib.dp_decode_batch_u8(
        joined, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        h, w, threads)
    if failed:
        raise IOError(f"native decode failed for {failed}/{n} files")
    return out
