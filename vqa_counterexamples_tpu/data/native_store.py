"""ctypes bindings for the native feature-store runtime (native/
feature_store.cpp): mmap-backed parallel row gather + async prefetch.

Auto-builds the shared library with the bundled Makefile on first use (g++ is
part of the toolchain); falls back to a numpy mmap implementation when the
build is unavailable so the framework stays importable anywhere.

Usage:
    store = NativeFeatureStore.open_npy("trainset.att.npy")
    out = store.gather(indices)                 # (n, cols) float32
    t = store.prefetch(indices, out_buffer)     # overlap with device work
    store.wait(t)
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_LIB_FAILED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native")


_ABI_VERSION = 2  # keep in sync with fs_abi_version() in feature_store.cpp


def load_library(build: bool = True):
    """Load (building if needed) libfeature_store.so; None if unavailable.

    ``make`` runs every first load — its dependency rule rebuilds the .so
    whenever feature_store.cpp is newer, so an ABI bump in the source can
    never be served by a stale binary.  A loaded library that still reports
    the wrong ``fs_abi_version`` falls back to numpy."""
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    so_path = os.path.join(_native_dir(), "libfeature_store.so")
    if build:
        try:
            subprocess.run(["make", "-C", _native_dir()], check=True,
                           capture_output=True)
        except Exception as exc:  # noqa: BLE001
            if not os.path.exists(so_path):
                print("native build failed (%s); using numpy fallback" % exc)
                _LIB_FAILED = True
                return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as exc:
        print("native load failed (%s); using numpy fallback" % exc)
        _LIB_FAILED = True
        return None
    try:
        lib.fs_abi_version.restype = ctypes.c_int32
        abi = lib.fs_abi_version()
    except AttributeError:
        abi = 1
    if abi != _ABI_VERSION:
        print("native store ABI %s != %s; using numpy fallback"
              % (abi, _ABI_VERSION))
        _LIB_FAILED = True
        return None
    lib.fs_open.restype = ctypes.c_int64
    lib.fs_open.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
    lib.fs_rows.restype = ctypes.c_int64
    lib.fs_rows.argtypes = [ctypes.c_int64]
    lib.fs_cols.restype = ctypes.c_int64
    lib.fs_cols.argtypes = [ctypes.c_int64]
    lib.fs_gather.restype = ctypes.c_int32
    lib.fs_gather.argtypes = [ctypes.c_int64,
                              ctypes.POINTER(ctypes.c_int64),
                              ctypes.c_int64,
                              ctypes.c_void_p]
    lib.fs_prefetch.restype = ctypes.c_int64
    lib.fs_prefetch.argtypes = lib.fs_gather.argtypes
    lib.fs_wait.restype = ctypes.c_int32
    lib.fs_wait.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.fs_close.restype = ctypes.c_int32
    lib.fs_close.argtypes = [ctypes.c_int64]
    _LIB = lib
    return _LIB


def _bf16_dtype():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def npy_header_bytes(path: str) -> tuple[int, tuple[int, ...], np.dtype]:
    """Offset of the data section, shape, and element dtype of a .npy file.

    Accepts C-order float32 and bfloat16 feature matrices.  bf16 features
    (``extract --feat-dtype bfloat16``) are written as a uint16 bit-view so
    stock numpy can still open the file; any 2-byte elementwise dtype
    (``<u2``/``|V2``) is interpreted as bf16 here — this store only ever
    holds CNN activations."""
    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        shape, fortran, dtype = np.lib.format._read_array_header(f, version)
        if fortran:
            raise ValueError("need C-order npy")
        if dtype == np.dtype("float32"):
            return f.tell(), shape, dtype
        if dtype.itemsize == 2 and dtype.kind in "uV":
            return f.tell(), shape, _bf16_dtype()
        if dtype == _bf16_dtype():
            return f.tell(), shape, dtype
        raise ValueError("need float32 or bfloat16 npy, got %s" % dtype)


class NativeFeatureStore:
    """Row store over an on-disk feature matrix (f32 or bf16 elements);
    gathers run in C++ threads."""

    def __init__(self, handle, lib, rows: int, cols: int,
                 fallback: np.ndarray | None = None,
                 row_shape: tuple[int, ...] | None = None,
                 dtype: np.dtype = np.dtype(np.float32)):
        self._handle = handle
        self._lib = lib
        self.rows = rows
        self.cols = cols
        self.row_shape = row_shape or (cols,)
        self.dtype = np.dtype(dtype)
        self._fallback = fallback

    # -- constructors --------------------------------------------------------
    @classmethod
    def open_npy(cls, path: str, n_threads: int = 0) -> "NativeFeatureStore":
        header, shape, dtype = npy_header_bytes(path)
        rows = shape[0]
        cols = int(np.prod(shape[1:]))
        lib = load_library()
        if lib is None:
            arr = np.memmap(path, dtype=dtype, mode="r", offset=header,
                            shape=(rows, cols))
            return cls(None, None, rows, cols, fallback=arr,
                       row_shape=tuple(shape[1:]), dtype=dtype)
        handle = lib.fs_open(path.encode(), rows, cols, header,
                             dtype.itemsize, n_threads)
        if handle < 0:
            raise OSError("fs_open failed with code %d for %s"
                          % (handle, path))
        return cls(handle, lib, rows, cols, row_shape=tuple(shape[1:]),
                   dtype=dtype)

    @classmethod
    def open_raw(cls, path: str, rows: int, cols: int,
                 header_bytes: int = 0,
                 n_threads: int = 0,
                 dtype=np.float32) -> "NativeFeatureStore":
        dtype = np.dtype(dtype)
        lib = load_library()
        if lib is None:
            arr = np.memmap(path, dtype=dtype, mode="r",
                            offset=header_bytes, shape=(rows, cols))
            return cls(None, None, rows, cols, fallback=arr, dtype=dtype)
        handle = lib.fs_open(path.encode(), rows, cols, header_bytes,
                             dtype.itemsize, n_threads)
        if handle < 0:
            raise OSError("fs_open failed with code %d" % handle)
        return cls(handle, lib, rows, cols, dtype=dtype)

    # -- ops ----------------------------------------------------------------
    def gather(self, indices, out: np.ndarray | None = None) -> np.ndarray:
        idx = np.ascontiguousarray(indices, dtype=np.int64).ravel()
        if out is None:
            out = np.empty((idx.shape[0], self.cols), dtype=self.dtype)
        assert out.flags.c_contiguous and out.dtype == self.dtype
        if self._fallback is not None:
            np.take(self._fallback, idx, axis=0, out=out)
            return out
        rc = self._lib.fs_gather(
            self._handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            idx.shape[0],
            ctypes.c_void_p(out.ctypes.data))
        if rc != 0:
            raise RuntimeError("fs_gather failed: %d" % rc)
        return out

    def prefetch(self, indices, out: np.ndarray):
        """Start an async gather into ``out``; returns a ticket for wait()."""
        idx = np.ascontiguousarray(indices, dtype=np.int64).ravel()
        assert out.flags.c_contiguous and out.dtype == self.dtype
        if self._fallback is not None:
            np.take(self._fallback, idx, axis=0, out=out)
            return -1
        ticket = self._lib.fs_prefetch(
            self._handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            idx.shape[0],
            ctypes.c_void_p(out.ctypes.data))
        if ticket < 0:
            raise RuntimeError("fs_prefetch failed: %d" % ticket)
        return ticket

    def wait(self, ticket) -> None:
        if self._fallback is not None or ticket == -1:
            return
        rc = self._lib.fs_wait(self._handle, ticket)
        if rc != 0:
            raise RuntimeError("fs_wait failed: %d" % rc)

    def close(self) -> None:
        if self._lib is not None and self._handle is not None:
            self._lib.fs_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass
