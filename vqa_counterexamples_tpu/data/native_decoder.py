"""ctypes bindings for the native image decoder (native/image_decoder.cpp):
GIL-free libjpeg decode + Pillow-bit-exact bilinear Scale -> CenterCrop.

The TPU-native replacement for the reference's PIL decode inside
multiprocessing DataLoader workers (reference vqa/datasets/images.py:23-24,
vqa/lib/dataloader.py:126-155).  Python threads cannot scale PIL decode (the
GIL serializes it — measured flat at ~57 images/sec regardless of worker
count), so the batch decode happens in one C call on a C++ thread pool; the
resampling arithmetic replicates Pillow's fixed-point bilinear path so the
output equals ``models.convnets.preprocess_image_uint8`` byte-for-byte
(tests/test_native_decoder.py).

Auto-builds with the bundled Makefile on first use; callers fall back to PIL
when the build or a given image (non-JPEG, exotic color space) is
unavailable.

Usage:
    dec = NativeImageDecoder(n_threads=8)
    batch, ok = dec.decode_files(paths, size=448)   # (n,448,448,3) u8, mask
    batch, ok = dec.decode_buffers(jpeg_bytes_list, size=448)
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_LIB_FAILED = False  # only set by a FULL (build=True) attempt failing
_ABI_VERSION = 2  # keep in sync with id_abi_version() in image_decoder.cpp


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native")


def load_library(build: bool = True):
    """Load (building if needed) libimage_decoder.so; None if unavailable.

    A miss with ``build=False`` is NOT cached: a later ``build=True`` caller
    (the extract CLI, the demo server) must still get its build attempt.
    The build itself holds an exclusive flock so concurrent processes (e.g.
    a --distributed multi-host launch sharing a filesystem) don't race g++
    writing the .so in place."""
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    so_path = os.path.join(_native_dir(), "libimage_decoder.so")
    if build:
        try:
            import fcntl

            with open(os.path.join(_native_dir(), ".build.lock"), "w") as lk:
                fcntl.flock(lk, fcntl.LOCK_EX)
                subprocess.run(["make", "-C", _native_dir(),
                                "libimage_decoder.so"],
                               check=True, capture_output=True)
        except Exception as exc:  # noqa: BLE001
            if not os.path.exists(so_path):
                print("native decoder build failed (%s); using PIL" % exc)
                _LIB_FAILED = True
                return None
    elif not os.path.exists(so_path):
        return None  # soft miss: leave the build=True path available
    try:
        lib = ctypes.CDLL(so_path)
        lib.id_abi_version.restype = ctypes.c_int32
        if lib.id_abi_version() != _ABI_VERSION:
            raise OSError("ABI %d != %d"
                          % (lib.id_abi_version(), _ABI_VERSION))
    except (OSError, AttributeError) as exc:
        print("native decoder load failed (%s); using PIL" % exc)
        if build:
            _LIB_FAILED = True
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.id_decode_files.restype = ctypes.c_int32
    lib.id_decode_files.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                    ctypes.c_int32, ctypes.c_int32,
                                    ctypes.c_int32, u8p, i32p]
    lib.id_decode_buffers.restype = ctypes.c_int32
    lib.id_decode_buffers.argtypes = [ctypes.POINTER(ctypes.c_void_p),
                                      ctypes.POINTER(ctypes.c_int64),
                                      ctypes.c_int32, ctypes.c_int32,
                                      ctypes.c_int32, u8p, i32p]
    _LIB = lib
    return _LIB


class NativeImageDecoder:
    """Batch JPEG -> (n, size, size, 3) uint8 Scale+CenterCrop decoder."""

    def __init__(self, n_threads: int | None = None, build: bool = True):
        self._lib = load_library(build=build)
        self.n_threads = n_threads or (os.cpu_count() or 1)

    @property
    def available(self) -> bool:
        return self._lib is not None

    def decode_files(self, paths, size: int = 448):
        """Decode files; returns ((n,size,size,3) uint8, (n,) bool ok).

        Rows with ok=False are left zeroed — decode those with PIL."""
        n = len(paths)
        out = np.zeros((n, size, size, 3), dtype=np.uint8)
        ok = np.zeros(n, dtype=np.int32)
        if self._lib is None or n == 0:
            return out, ok.astype(bool)
        arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
        self._lib.id_decode_files(
            arr, n, self.n_threads, size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out, ok.astype(bool)

    def decode_buffers(self, buffers, size: int = 448):
        """Decode in-memory JPEG byte strings (serving request bodies)."""
        n = len(buffers)
        out = np.zeros((n, size, size, 3), dtype=np.uint8)
        ok = np.zeros(n, dtype=np.int32)
        if self._lib is None or n == 0:
            return out, ok.astype(bool)
        bufs = (ctypes.c_void_p * n)(
            *[ctypes.cast(ctypes.c_char_p(b), ctypes.c_void_p)
              for b in buffers])
        lens = (ctypes.c_int64 * n)(*[len(b) for b in buffers])
        self._lib.id_decode_buffers(
            bufs, lens, n, self.n_threads, size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out, ok.astype(bool)
