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


def _bind_video(lib) -> bool:
    if not hasattr(lib, "dp_video_open"):
        return False  # pre-v3 library on disk
    if lib.dp_video_open.restype != ctypes.c_longlong:
        lib.dp_video_open.restype = ctypes.c_longlong
        lib.dp_video_open.argtypes = [ctypes.c_char_p]
        for fn in (lib.dp_video_frames, lib.dp_video_width,
                   lib.dp_video_height):
            fn.restype = ctypes.c_int
            fn.argtypes = [ctypes.c_longlong]
        lib.dp_video_fps.restype = ctypes.c_double
        lib.dp_video_fps.argtypes = [ctypes.c_longlong]
        lib.dp_video_decode_u8.restype = ctypes.c_int
        lib.dp_video_decode_u8.argtypes = [
            ctypes.c_longlong, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.dp_video_decode.restype = ctypes.c_int
        lib.dp_video_decode.argtypes = [
            ctypes.c_longlong, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        lib.dp_video_close.restype = None
        lib.dp_video_close.argtypes = [ctypes.c_longlong]
    return True


class VideoReader:
    """Random-access MJPEG video reader over the native plane's mmap'd
    demuxer (native/dataplane.cpp dp_video_*).

    Accepts MJPEG-in-AVI containers and raw concatenated-JPEG streams.
    Frames decode independently (MJPEG is all-keyframe), so the temporal
    samplers' strided/clip subsets map to a threaded decode of exactly the
    requested indices — the production replacement for the reference's
    PNG-per-frame layout (MT4MTLKD/readme.md:30-89), whose decode cost
    cannot feed a serving chip (docs/BENCH.md hostplane rows).
    """

    def __init__(self, path: str):
        lib = load_library()
        if lib is None or not _bind_video(lib):
            raise RuntimeError("native data plane v3 not built; run "
                               "native/build.sh")
        self._lib = lib
        self._handle = lib.dp_video_open(path.encode())
        if not self._handle:
            raise IOError(f"not an MJPEG video (or unreadable): {path}")
        self.path = path

    def __len__(self) -> int:
        return self._lib.dp_video_frames(self._handle)

    @property
    def width(self) -> int:
        return self._lib.dp_video_width(self._handle)

    @property
    def height(self) -> int:
        return self._lib.dp_video_height(self._handle)

    @property
    def fps(self) -> float:
        return self._lib.dp_video_fps(self._handle)

    def _indices(self, indices) -> "np.ndarray":
        idx = np.ascontiguousarray(indices, np.int32)
        if idx.ndim != 1:
            raise ValueError("indices must be 1-D")
        return idx

    def read_u8(self, indices, size: Tuple[int, int],
                n_threads: Optional[int] = None) -> np.ndarray:
        """Decode+resize the given frame indices -> (N, H, W, 3) uint8
        (device-side normalization path, like decode_batch_u8)."""
        idx = self._indices(indices)
        h, w = size
        out = np.empty((len(idx), h, w, 3), np.uint8)
        failed = self._lib.dp_video_decode_u8(
            self._handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(idx), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            h, w, n_threads or min(os.cpu_count() or 1, 16))
        if failed:
            raise IOError(f"video decode failed for {failed}/{len(idx)} "
                          f"frames of {self.path}")
        return out

    def read(self, indices, size: Tuple[int, int], mean=IMAGENET_MEAN,
             std=IMAGENET_STD, n_threads: Optional[int] = None) -> np.ndarray:
        """Decode+resize+normalize -> (N, H, W, 3) float32."""
        idx = self._indices(indices)
        h, w = size
        out = np.empty((len(idx), h, w, 3), np.float32)
        failed = self._lib.dp_video_decode(
            self._handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(idx), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            h, w, _cfloats(np.ascontiguousarray(mean, np.float32)),
            _cfloats(np.ascontiguousarray(std, np.float32)),
            n_threads or min(os.cpu_count() or 1, 16))
        if failed:
            raise IOError(f"video decode failed for {failed}/{len(idx)} "
                          f"frames of {self.path}")
        return out

    def close(self):
        if self._handle:
            self._lib.dp_video_close(self._handle)
            self._handle = 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def video_supported() -> bool:
    lib = load_library()
    return lib is not None and hasattr(lib, "dp_video_open")
